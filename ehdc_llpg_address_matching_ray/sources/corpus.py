"""Deterministic synthetic pages corpus with planted duplicate clusters.

Implements FIXTURES.md §1-2: Common-Crawl-shaped pages
``(url, warc_ts, html, text, lang)`` whose texts are address-like entity
strings with controlled corruptions mirroring the reference's
dirty-address phenomena (abbreviations internal/normalize/address.go:27-59,
typos within Damerau-Levenshtein ≤ 2 internal/symspell/*, case/punctuation
noise, dropped locality tokens), plus:

- ``pages_truth``  (url, entity_id) ground-truth sidecar
- ``labeled_pairs`` (url_a, url_b, is_match) — ~50% positives; negatives
  are HARD negatives: same street different house number (the
  "4 MONKS ORCHARD ≠ 16 MONKS ORCHARD" regression class,
  internal/validation/validator_test.go:173), same locality different
  street.

Everything is seeded (numpy RandomState) — no wall clock, byte-stable
across runs.  Domains follow a Zipfian distribution with deliberately hot
domains (≥20% of rows) to exercise salted-key skew handling.
"""

from __future__ import annotations

import hashlib
import html as html_mod
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_STREET_NAMES = [
    "HIGH", "CHURCH", "STATION", "MILL", "PARK", "GROVE", "WINCHESTER",
    "LONDON", "QUEENS", "KINGS", "VICTORIA", "ALBERT", "MONKS", "ORCHARD",
    "MEADOW", "RIVER", "FOREST", "DOWNS", "CHAPEL", "SCHOOL", "MANOR",
    "GREENFIELDS", "OAKWOOD", "ASHFIELD", "BEECHWOOD", "CEDARWOOD",
    "ELMWOOD", "HAWTHORN", "JUNIPER", "LAVENDER", "MAGNOLIA", "PRIMROSE",
    "ROSEWOOD", "SYCAMORE", "WILLOW", "BLUEBELL", "FOXGLOVE", "HONEYSUCKLE",
]
_STREET_TYPES = ["ROAD", "LANE", "STREET", "AVENUE", "CLOSE", "DRIVE", "GARDENS", "COURT", "WAY", "CRESCENT"]
# inverse of the abbreviation table (address.go:27-59) — the corruption
# that canonicalization exactly undoes
_ABBREV_INV = {
    "ROAD": "RD", "STREET": "ST", "AVENUE": "AVE", "GARDENS": "GDNS",
    "COURT": "CT", "DRIVE": "DR", "LANE": "LN", "CRESCENT": "CRES",
    "CLOSE": "CL", "WAY": "WY",
}
_LOCALITIES = [
    "ALTON", "PETERSFIELD", "LIPHOOK", "HORNDEAN", "BORDON", "GRAYSHOTT",
    "HEADLEY", "LINDFORD", "MEDSTEAD", "CHAWTON", "SELBORNE", "HAWKLEY",
    "LISS", "BURITON", "ROPLEY", "BINSTED", "BENTLEY", "FARNHAM",
]
_PC_AREAS = ["GU", "SO", "PO", "RG", "SP"]

_LANGS = ["en"] * 17 + ["de", "fr", "es"]


def _entity_text(rng: np.random.RandomState, i: int) -> tuple[str, list[str]]:
    """One ground-truth entity: pristine address-like string + its parts."""
    house = str(rng.randint(1, 120))
    if rng.rand() < 0.15:
        house += "ABCDEF"[rng.randint(0, 6)]
    name = _STREET_NAMES[rng.randint(0, len(_STREET_NAMES))]
    if rng.rand() < 0.3:
        name2 = _STREET_NAMES[rng.randint(0, len(_STREET_NAMES))]
        if name2 != name:
            name = f"{name} {name2}"
    stype = _STREET_TYPES[rng.randint(0, len(_STREET_TYPES))]
    loc = _LOCALITIES[rng.randint(0, len(_LOCALITIES))]
    area = _PC_AREAS[rng.randint(0, len(_PC_AREAS))]
    postcode = f"{area}{rng.randint(1, 35)} {rng.randint(0, 9)}{chr(65 + rng.randint(0, 20))}{chr(66 + rng.randint(0, 20))}"
    parts = [house, name, stype, loc, postcode]
    return f"{house} {name} {stype}, {loc}, {postcode}", parts


def _typo(rng: np.random.RandomState, word: str) -> str:
    """One Damerau-Levenshtein-1 corruption of an alpha word ≥ 4 chars."""
    if len(word) < 4 or not word.isalpha():
        return word
    i = rng.randint(1, len(word) - 1)
    op = rng.randint(0, 3)
    if op == 0:  # swap adjacent
        return word[: i] + word[i + 1] + word[i] + word[i + 2 :]
    if op == 1:  # delete
        return word[:i] + word[i + 1 :]
    return word[:i] + word[i] + word[i:]  # duplicate


def _variant(rng: np.random.RandomState, parts: list[str]) -> str:
    """A corrupted page rendition of an entity (cluster member)."""
    house, name, stype, loc, postcode = parts
    stype_out = stype
    if rng.rand() < 0.5 and stype in _ABBREV_INV:
        stype_out = _ABBREV_INV[stype]
    name_out = name
    if rng.rand() < 0.30:  # at most one DL-1 typo in one street word
        words = name_out.split(" ")
        j = rng.randint(0, len(words))
        words[j] = _typo(rng, words[j])
        name_out = " ".join(words)
    pieces = [f"{house} {name_out} {stype_out}"]
    if rng.rand() >= 0.15:  # 15% drop the locality
        pieces.append(loc)
    if rng.rand() >= 0.10:  # 10% drop the postcode
        pieces.append(postcode)
    sep = ", " if rng.rand() < 0.7 else " "
    s = sep.join(pieces)
    style = rng.rand()
    if style < 0.3:
        s = s.lower()
    elif style < 0.5:
        s = s.title()
    if rng.rand() < 0.2:
        s = s.replace(",", ".")
    if rng.rand() < 0.1:
        s = "  " + s + " "
    return s


def _page_html(text: str, title: str) -> bytes:
    """Minimal html wrapper; the extractor must recover ``text``
    byte-identically (FIXTURES.md §1 html column)."""
    body = html_mod.escape(text, quote=False)
    return (
        f"<html><head><title>{html_mod.escape(title, quote=False)}</title></head>"
        f"<body>\n<div class=\"nav\">home | about</div>\n<p>{body}</p>\n"
        f"<div class=\"footer\">&copy; example</div>\n</body></html>"
    ).encode("utf-8")


def generate_corpus(
    n_entities: int = 500,
    seed: int = 42,
    hot_domain_frac: float = 0.25,
) -> tuple[pa.Table, pa.Table, pa.Table]:
    """Build (pages, pages_truth, labeled_pairs) Arrow tables.

    Cluster sizes mirror the reference's group-size band 1-30
    (cmd/matcher-v2/main.go:858); ~40% singletons, heavy tail capped at 30.
    """
    rng = np.random.RandomState(seed)
    n_domains = 40
    domains = [f"site{d:02d}.example.org" for d in range(n_domains)]
    # Zipfian domain weights with hot head
    w = 1.0 / np.arange(1, n_domains + 1) ** 1.3
    w[0] *= hot_domain_frac * n_domains / 4  # force a hot head domain
    w /= w.sum()

    base_ts = np.int64(1735689600000000)  # 2025-01-01T00:00:00Z in µs

    urls: list[str] = []
    tss: list[int] = []
    htmls: list[bytes] = []
    texts: list[str] = []
    langs: list[str] = []
    entity_ids: list[int] = []
    entity_parts: list[list[str]] = []
    cluster_urls: list[list[str]] = []

    seen_keys: set[tuple[str, str, str, str]] = set()
    for e in range(n_entities):
        # entities must be unique on (house, street, type, locality) so two
        # different entities can never collapse to the same canonical text
        # when a variant drops the postcode
        for _ in range(100):
            pristine, parts = _entity_text(rng, e)
            key = (parts[0], parts[1], parts[2], parts[3])
            if key not in seen_keys:
                seen_keys.add(key)
                break
        entity_parts.append(parts)
        if rng.rand() < 0.4:
            size = 1
        else:
            size = min(30, 2 + int(rng.exponential(3.0)))
        members: list[str] = []
        for v in range(size):
            text = pristine if v == 0 else _variant(rng, parts)
            dom = domains[rng.choice(n_domains, p=w)]
            url = f"https://{dom}/page/{e:06d}/{v:02d}"
            title = f"Listing {e}-{v}"
            urls.append(url)
            tss.append(int(base_ts + rng.randint(0, 30 * 24 * 3600) * 1_000_000))
            htmls.append(_page_html(text, title))
            texts.append(text)
            langs.append(_LANGS[rng.randint(0, len(_LANGS))])
            entity_ids.append(e)
            members.append(url)
        cluster_urls.append(members)

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.large_binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    truth = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "entity_id": pa.array(entity_ids, pa.int64()),
        }
    )

    # ---- labeled pairs: positives within clusters, hard negatives across
    pos_a: list[str] = []
    pos_b: list[str] = []
    for members in cluster_urls:
        if len(members) >= 2:
            # all adjacent pairs + a sampled extra
            for i in range(len(members) - 1):
                pos_a.append(members[i])
                pos_b.append(members[i + 1])

    n_pos = len(pos_a)
    neg_a: list[str] = []
    neg_b: list[str] = []
    # same-street-different-house negatives: entities sharing street+locality
    by_street: dict[tuple[str, str, str], list[int]] = {}
    for e, parts in enumerate(entity_parts):
        by_street.setdefault((parts[1], parts[2], parts[3]), []).append(e)
    hard_groups = [v for v in by_street.values() if len(v) >= 2]
    while len(neg_a) < n_pos and hard_groups:
        g = hard_groups[rng.randint(0, len(hard_groups))]
        e1, e2 = g[rng.randint(0, len(g))], g[rng.randint(0, len(g))]
        if e1 == e2:
            continue
        neg_a.append(cluster_urls[e1][0])
        neg_b.append(cluster_urls[e2][0])
    # fill remainder with same-locality random negatives
    while len(neg_a) < n_pos:
        e1, e2 = rng.randint(0, n_entities), rng.randint(0, n_entities)
        if e1 == e2:
            continue
        neg_a.append(cluster_urls[e1][0])
        neg_b.append(cluster_urls[e2][0])

    labeled = pa.table(
        {
            "url_a": pa.array(pos_a + neg_a, pa.string()),
            "url_b": pa.array(pos_b + neg_b, pa.string()),
            "is_match": pa.array([True] * n_pos + [False] * len(neg_a), pa.bool_()),
        }
    )
    return pages, truth, labeled


def write_corpus(out_dir: str, n_entities: int = 500, seed: int = 42, shards: int = 4) -> str:
    """Write (or reuse) a cached corpus directory; returns the directory.

    Layout: pages/part-*.parquet (sharded so Ray reads in parallel),
    pages_truth.parquet, labeled_pairs.parquet, plus a marker recording
    the generation parameters.
    """
    marker = os.path.join(out_dir, f"_DONE_n{n_entities}_s{seed}")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(os.path.join(out_dir, "pages"), exist_ok=True)
    pages, truth, labeled = generate_corpus(n_entities, seed)
    n = pages.num_rows
    per = max(1, (n + shards - 1) // shards)
    for s in range(shards):
        lo = s * per
        if lo >= n:
            break
        pq.write_table(pages.slice(lo, per), os.path.join(out_dir, "pages", f"part-{s:04d}.parquet"))
    pq.write_table(truth, os.path.join(out_dir, "pages_truth.parquet"))
    pq.write_table(labeled, os.path.join(out_dir, "labeled_pairs.parquet"))
    with open(marker, "w") as f:
        f.write(f"n_entities={n_entities} seed={seed} rows={n}\n")
    return out_dir
