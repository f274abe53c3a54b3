"""Pairwise scoring — the stateful actor-pool stage.

Two scorers over candidate-pair batches:

- **production** (north rule): batched Jaro-Winkler + token-set ratio
  (min-set containment, the reference's TokenOverlap semantics,
  internal/normalize/address.go:303-330) + TF-IDF cosine with a
  broadcast idf vector.  This drives the flagship linkage edges.
- **fidelity**: the full reference feature set P1 + linear blend P2
  (internal/match/features.go:34-146, scorer.go:52-139) for parity
  checks and the reference-semantics queries.

The actor holds the idf dictionary and config (loaded once per actor,
SURVEY.md ST1-ST3 pattern).  Per-batch work has two forms: under the
broadcast payload, ``build_payload_index`` precomputes a CSR index once
in a remote task and ``_score_csr`` scores each batch with pure
searchsorted/ragged-gather kernels (no per-pair Python except the gated
greedy DL-1 rescue); under the join path (pairs carry their own text
columns) the per-text-cached ``_ts_tf_batch`` kernels apply.  Both are
property-tested value-identical to the scalar ports, which remain the
parity oracles.

Edge semantics (P5/P6 analogue): a pair becomes a cluster edge iff
``score >= edge_threshold`` AND the house-number veto passes (exact
common house number required when both sides carry numbers — the
conservative validator rule, internal/validation/validator.go:87-95,
which the "4 MONKS ORCHARD ≠ 16 MONKS ORCHARD" regression demands).
"""

from __future__ import annotations

import math
from collections import Counter
from functools import lru_cache
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import FeatureWeights
from ..functions import features as F
from ..functions import normalize as N
from ..functions import strings as S
from ..functions import symspell as SS


@dataclass(frozen=True)
class ProductionWeights:
    jaro_winkler: float = 0.50
    token_set: float = 0.25
    tfidf_cosine: float = 0.25
    edge_threshold: float = 0.80
    # Jaro-Winkler is O(len^2) per pair in pure Python; character-position
    # alignment carries no signal past the first few dozen chars of a web
    # document, so score it on a bounded prefix (address-length strings
    # are unaffected; long-document cost drops quadratically).
    max_jw_len: int = 64
    # production JW kernel: DuckDB's vectorized C++
    # jaro_winkler_similarity (measured 32x the numpy batch kernel on
    # 64-char texts; each actor holds one single-threaded connection).
    # False = the byte-wise ported kernel (functions/strings.py), which
    # remains the reference-parity oracle either way.
    native_jw: bool = True
    # P3 — scoring formula selector (internal/engine/fuzzy.go:287-331):
    # "production" = the P2 linear blend above (the documented primary,
    # ADDRESS_MATCHING_ALGORITHM.md:208-223); "alt" = the engine package's
    # alternative fuzzy blend (functions.features.score_features_alt),
    # evaluated on the full per-pair feature set.  The house-number veto
    # applies under both formulas.
    formula: str = "production"


def fit_idf(token_doc_freqs: dict[str, int], n_docs: int) -> dict[str, float]:
    """idf(t) = ln((1+N)/(1+df)) + 1 (smoothed); OOV handled at use site."""
    return {t: math.log((1 + n_docs) / (1 + df)) + 1.0 for t, df in token_doc_freqs.items()}


def tfidf_cosine(tokens_a: list[str], tokens_b: list[str], idf: dict[str, float], default_idf: float) -> float:
    if not tokens_a or not tokens_b:
        return 1.0 if not tokens_a and not tokens_b else 0.0
    fa, fb = Counter(tokens_a), Counter(tokens_b)
    dot = 0.0
    for t, ca in fa.items():
        cb = fb.get(t)
        if cb:
            w = idf.get(t, default_idf)
            dot += (ca * w) * (cb * w)
    if dot == 0.0:
        return 0.0
    na = math.sqrt(sum((c * idf.get(t, default_idf)) ** 2 for t, c in fa.items()))
    nb = math.sqrt(sum((c * idf.get(t, default_idf)) ** 2 for t, c in fb.items()))
    if na == 0.0 or nb == 0.0:
        return 0.0
    return dot / (na * nb)


def fuzzy_token_overlap(tokens_a: list[str], tokens_b: list[str]) -> float:
    """Token-set ratio over the smaller set (TokenOverlap semantics,
    internal/normalize/address.go:303-330) extended with a greedy
    Damerau-Levenshtein≤1 pass for the leftovers — the typo-absorbing
    role the reference's phonetic hit count plays in P1
    (internal/match/features.go:319-334).  Digit-bearing tokens only
    match exactly (house numbers / codes must never fuzzy-match)."""
    if not tokens_a or not tokens_b:
        return 1.0 if not tokens_a and not tokens_b else 0.0
    sa, sb = set(tokens_a), set(tokens_b)
    common = len(sa & sb)
    # sorted: the greedy DL pass is order-dependent; deterministic order
    # keeps this scalar kernel bit-identical to the cached batch variant
    rest_a = sorted(t for t in sa - sb if t.isalpha() and len(t) >= 3)
    rest_b = sorted(t for t in sb - sa if t.isalpha() and len(t) >= 3)
    # the fuzzy pass is O(|rest_a|*|rest_b|) DL computations — meaningful
    # for short address-like strings (leftovers 1-3) but quadratic noise
    # for long documents; cap the work, exact overlap dominates there
    if rest_a and rest_b and len(rest_a) * len(rest_b) <= 64:
        used = [False] * len(rest_b)
        for ta in rest_a:
            for j, tb in enumerate(rest_b):
                if used[j] or abs(len(ta) - len(tb)) > 1:
                    continue
                if SS.within_one_edit(ta, tb):
                    used[j] = True
                    common += 1
                    break
    return min(1.0, common / min(len(sa), len(sb)))


def enrich_payload(batch: pa.Table) -> pa.Table:
    """(url, text, canonical, ...) -> + house_nums / loc_toks columns.

    Per-text regex extraction (P6 veto inputs + D2 locality overlap)
    computed ONCE per representative in this distributed map, instead of
    once per scorer WORKER per text via the lru caches — that repeat was
    a width-independent floor on the scoring stage.  The scorer falls
    back to the cached extraction when these columns are absent
    (non-broadcast payload path)."""
    texts = batch["text"].to_pylist()
    out = batch.append_column(
        "house_nums",
        pa.array([N.extract_house_numbers(t or "") for t in texts], pa.list_(pa.string())),
    ).append_column(
        "loc_toks",
        pa.array([N.extract_locality_tokens(t or "") for t in texts], pa.list_(pa.string())),
    )
    if "nid" not in out.column_names:
        # stable int64 row identity (same 63-bit url fingerprint the
        # cluster stage uses): pairs carry (id_a, id_b) instead of url
        # strings — 16 bytes/pair through every downstream shuffle/sort
        from .cluster import url_to_node_id

        out = out.append_column(
            "nid", pa.array(url_to_node_id(batch["url"].to_pylist()), pa.int64())
        )
    return out


def combine_payload_blocks(*blocks) -> pa.Table:
    """Pre-combine + nid-sort the broadcast payload ONCE, in a single
    remote task that overlaps the blocking stage: every scorer worker
    then skips its own concat / combine_chunks / argsort — a per-worker
    build that was a width-independent ~1 s floor on the scoring stage
    (all workers rebuild it concurrently at stage start, at every
    cluster width)."""
    tables = [t for t in blocks if t.num_rows]
    if not tables:
        return blocks[0].slice(0, 0) if blocks else pa.table({})
    t = pa.concat_tables(tables).combine_chunks()
    if "nid" in t.column_names:
        order = pc.sort_indices(t["nid"])
        t = t.take(order).combine_chunks()
    return t


def _csr_flat_idx(indptr: np.ndarray, rows: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Ragged gather plan: flat value indices + per-row lengths for the
    CSR rows in ``rows`` — pure numpy, no per-row Python."""
    starts = indptr[rows]
    lens = (indptr[rows + 1] - starts).astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64), lens
    offs = np.cumsum(lens) - lens
    idx = np.repeat(starts - offs, lens) + np.arange(total, dtype=np.int64)
    return idx, lens


def _rowwise_unique(row_of: np.ndarray, codes: np.ndarray, n_rows: int):
    """(row, code) pairs -> per-row SORTED UNIQUE codes as a CSR, plus
    per-entry multiplicities.  Packs (row << 32 | code) into int64
    (row < 2^31, code < 2^32, both non-negative) and uses one
    np.unique — the same trick the scorer's sort-merge uses."""
    if len(codes):
        key = (row_of << 32) | codes
        uk, counts = np.unique(key, return_counts=True)
        urow = uk >> 32
        ucode = (uk & 0xFFFFFFFF).astype(np.uint32)
    else:
        urow = np.empty(0, np.int64)
        ucode = np.empty(0, np.uint32)
        counts = np.empty(0, np.int64)
    per_row = np.bincount(urow, minlength=n_rows)
    indptr = np.zeros(n_rows + 2, np.int64)
    np.cumsum(per_row, out=indptr[1 : n_rows + 1])
    indptr[n_rows + 1] = indptr[n_rows]
    return indptr, ucode, counts, urow


def _list_col_codes(col, n_rows: int, upper: bool = False):
    """list<string> column -> (flat row ids, flat int64 codes).  Values
    are dictionary-encoded in C++ (no per-value Python); ``upper``
    applies PYTHON str.upper over the (small) dictionary only — the
    scalar kernels' semantics, which Arrow utf8_upper diverges from on
    e.g. 'ß' — then merges ids that collide after uppercasing.  Null
    rows count as empty; gathering from the true per-row offsets keeps
    alignment even when null rows carry non-empty offset ranges."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    off = arr.offsets.to_numpy().astype(np.int64)
    lens = np.diff(off)
    if arr.null_count:
        lens = np.where(np.asarray(arr.is_null()), 0, lens)
    row_of = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
    total = int(lens.sum())
    if not total:
        return row_of, np.empty(0, np.int64)
    denc = pc.dictionary_encode(pc.fill_null(arr.values, ""))
    vcodes = denc.indices.to_numpy(zero_copy_only=False)
    offs = np.cumsum(lens) - lens
    idx = np.repeat(off[:-1] - offs, lens) + np.arange(total, dtype=np.int64)
    codes = vcodes[idx]
    if upper:
        vocab = denc.dictionary.to_pylist()
        seen: dict[str, int] = {}
        remap = np.empty(len(vocab), np.int64)
        for i, v in enumerate(vocab):
            u = v.upper()
            j = seen.get(u)
            if j is None:
                j = seen[u] = len(seen)
            remap[i] = j
        codes = remap[codes]
    return row_of, codes


def build_dl1_pairs(
    vocab: list[str], tok_isrest: np.ndarray, max_candidates: int = 4_000_000
) -> np.ndarray | None:
    """Precomputed VERIFIED DL-1 neighborhood of the rest-eligible vocab
    (the SymSpell deletes-index trick, built once in the payload-index
    remote task): bucket every eligible token by its delete-1 variants
    plus identity, verify each candidate pair once with
    ``within_one_edit``, and emit a sorted uint64 key array holding both
    (a<<32|b) directions — the greedy rescue's membership test becomes
    one searchsorted per batch, no strings and no per-worker verdict
    cache.  Completeness: any DL-1 pair shares a delete-1 variant
    (substitution — delete the differing char on both; adjacent
    transposition — delete either swapped char; insertion/deletion — the
    shorter string IS a delete of the longer), so bucket candidates ⊇
    true pairs and the verification step keeps exactness.  Returns None
    when the candidate mass exceeds ``max_candidates`` (adversarial
    vocab shape) — callers fall back to the scalar path."""
    from collections import defaultdict

    buckets: dict[str, list[int]] = defaultdict(list)
    for tid in np.flatnonzero(tok_isrest).tolist():
        t = vocab[tid]
        buckets[t].append(tid)
        for i in range(len(t)):
            buckets[t[:i] + t[i + 1 :]].append(tid)
    cand: set[tuple[int, int]] = set()
    budget = max_candidates
    for ids in buckets.values():
        if len(ids) < 2:
            continue
        uniq = sorted(set(ids))
        m = len(uniq)
        if m < 2:
            continue
        budget -= m * (m - 1) // 2
        if budget < 0:
            return None
        for x in range(m):
            for y in range(x + 1, m):
                cand.add((uniq[x], uniq[y]))
    keys: list[int] = []
    for a, b in cand:
        if SS.within_one_edit(vocab[a], vocab[b]):
            keys.append((a << 32) | b)
            keys.append((b << 32) | a)
    return np.sort(np.asarray(keys, dtype=np.uint64))


def build_payload_index(idf, n_docs: int, *blocks):
    """The broadcast-payload remote task, round-4 form: combine + sort
    the payload blocks (exactly ``combine_payload_blocks``) AND
    precompute the scorer's CSR index — token ids / idf weights / norms,
    DL-1-eligible token ids, house-number and locality id CSRs, and the
    JW-truncated canonicals — ONCE, overlapping the blocking stage.
    Scorer workers then run pure array kernels per batch: no per-pair
    Python, no per-worker string tokenization, no row materialization.

    Returns ``(payload_table, index_dict | None)``.  Token/house/loc ids
    are uint32 (fits: the broadcast path is row-gated at
    ``broadcast_payload_max`` ≪ 2^31; the join path carries strings and
    never builds this index).  Token ids are assigned in STRING-SORTED
    order so per-row ascending ids == Python ``sorted()`` order — the
    greedy DL-1 rescue (order-dependent) stays bit-identical to the
    scalar kernel."""
    tables = [b for b in blocks if b.num_rows]
    if not tables:
        return (blocks[0].slice(0, 0) if blocks else pa.table({}), None)
    t = pa.concat_tables(tables).combine_chunks()
    if "house_nums" not in t.column_names or "nid" not in t.column_names:
        t = enrich_payload(t)
    t = t.take(pc.sort_indices(t["nid"])).combine_chunks()
    n = t.num_rows

    # --- tokens: split(" ") keeping empties; empty canonical -> no tokens
    canon = pc.fill_null(t["canonical"].combine_chunks(), "")
    toks = pc.split_pattern(canon, " ")
    off = toks.offsets.to_numpy().astype(np.int64)
    lens = np.diff(off)
    row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    denc = pc.dictionary_encode(toks.values)
    # int32 indices upcast lazily in the arithmetic below (saves a copy)
    codes = denc.indices.to_numpy(zero_copy_only=False)
    vocab = denc.dictionary.to_pylist()
    empty_rows = np.asarray(pc.equal(canon, "").to_numpy(zero_copy_only=False))
    if empty_rows.any():
        keep = ~empty_rows[row_of]
        row_of = row_of[keep]
        codes = codes[keep]
    # remap ids to string rank (vocab < 2^32 guarded by the row gate;
    # a pathological vocab overflow must fail loudly, not wrap)
    if len(vocab) >= (1 << 32) or n >= (1 << 31):
        raise ValueError("payload too large for the uint32 CSR index")
    order = sorted(range(len(vocab)), key=vocab.__getitem__)
    rank = np.empty(len(vocab), np.int64)
    rank[np.asarray(order, dtype=np.int64)] = np.arange(len(vocab), dtype=np.int64)
    vocab = [vocab[i] for i in order]
    codes = rank[codes] if len(codes) else codes
    tok_len = np.fromiter((len(x) for x in vocab), np.int32, len(vocab))
    tok_isrest = np.fromiter(
        (x.isalpha() and len(x) >= 3 for x in vocab), bool, len(vocab)
    )
    default_idf = math.log(1 + max(1, n_docs)) + 1.0
    idf = idf or {}
    idf_vec = np.fromiter((idf.get(x, default_idf) for x in vocab), np.float64, len(vocab))
    tok_indptr, tok_ids, tok_counts, tok_rows = _rowwise_unique(row_of, codes, n)
    tok_w = tok_counts * idf_vec[tok_ids.astype(np.int64)]
    # sequential per-row accumulation == np.sum for short rows (the
    # scalar kernel's order); long-document rows differ by <=1e-15 rel
    norm = np.sqrt(np.bincount(tok_rows, weights=tok_w * tok_w, minlength=n))
    tok_norm = np.append(norm, 0.0)
    rmask = tok_isrest[tok_ids.astype(np.int64)]
    rest_ids = tok_ids[rmask]
    rest_per_row = np.bincount(tok_rows[rmask], minlength=n)
    rest_indptr = np.zeros(n + 2, np.int64)
    np.cumsum(rest_per_row, out=rest_indptr[1 : n + 1])
    rest_indptr[n + 1] = rest_indptr[n]

    # --- house numbers: uppercase (Python semantics), per-row unique set
    hrow, hcodes = _list_col_codes(t["house_nums"], n, upper=True)
    house_indptr, house_ids, _, _ = _rowwise_unique(hrow, hcodes, n)

    # --- locality tokens: LIST (multiplicity, for counts/denominators)
    # and SET (side-a membership) CSRs over one interned id space
    lrow, lcodes = _list_col_codes(t["loc_toks"], n)
    locl_indptr = np.zeros(n + 2, np.int64)
    np.cumsum(np.bincount(lrow, minlength=n), out=locl_indptr[1 : n + 1])
    locl_indptr[n + 1] = locl_indptr[n]
    locs_indptr, locs_ids, _, _ = _rowwise_unique(lrow, lcodes, n)

    # --- JW input: codepoint slice (== Python c[:mjl]) + "" sentinel row
    mjl = ProductionWeights.max_jw_len
    trunc = pa.concat_arrays(
        [pc.utf8_slice_codeunits(canon, 0, mjl), pa.array([""], pa.string())]
    )

    return (
        t,
        {
            "n": n,
            "mjl": mjl,
            "tok_indptr": tok_indptr,
            "tok_ids": tok_ids,
            "tok_w": tok_w,
            "tok_norm": tok_norm,
            "rest_indptr": rest_indptr,
            "rest_ids": rest_ids,
            "house_indptr": house_indptr,
            "house_ids": house_ids,
            "locl_indptr": locl_indptr,
            "locl_ids": lcodes.astype(np.uint32),
            "locs_indptr": locs_indptr,
            "locs_ids": locs_ids,
            "tok_len": tok_len,
            "tok_isrest": tok_isrest,
            "vocab": pa.array(vocab, pa.string()),
            "trunc": trunc,
            # verified DL-1 token-pair keys (None on adversarial vocab
            # overflow -> the rescue's scalar fallback)
            "dl1": build_dl1_pairs(vocab, tok_isrest),
        },
    )


@lru_cache(maxsize=262144)
def _house_numbers_cached(text: str) -> tuple[str, ...]:
    return tuple(N.extract_house_numbers(text))


@lru_cache(maxsize=262144)
def _locality_tokens_cached(text: str) -> tuple[str, ...]:
    return tuple(N.extract_locality_tokens(text))


def house_number_veto(text_a: str, text_b: str) -> bool:
    """True = vetoed (reject pair).  Exact-common-number rule (P6).
    Per-side extraction is cached: each text reappears in many pairs."""
    ha = _house_numbers_cached(text_a)
    hb = _house_numbers_cached(text_b)
    if ha and hb and not F.has_common_element(list(ha), list(hb)):
        return True
    return False


class PairScorer:
    """map_batches actor: candidate pairs -> scored pairs.

    Constructor args are plain picklable values; ``idf`` may be a
    ``ray.ObjectRef`` (broadcast once via ray.put and resolved here, once
    per actor — never re-shipped per batch).
    """

    # per-text cache cap: bounds worker heap.  Must exceed the broadcast
    # payload's row count or the full-clear-on-overflow row cache
    # thrashes mid-stage (each worker touches most reps; at 907k reps a
    # 500k cap forced repeated rebuild of ~0.5 GB of tuples).  The
    # broadcast byte gate bounds the payload this cap must cover, and
    # decide's release_worker_state drops the whole scorer slot the
    # moment scoring ends, so the heap cost is stage-scoped.
    _CAP = 2_500_000

    def __init__(
        self,
        idf=None,
        n_docs: int = 1,
        prod: ProductionWeights | None = None,
        weights: FeatureWeights | None = None,
        fidelity: bool = False,
        payload=None,
    ):
        self._ptable = None
        self._phash = None
        self._prow = None
        self._pid_sorted = None
        self._pid_rows = None
        self._csr = None
        self._vocab_str: dict[int, str] = {}
        self._row_cache: dict[int, tuple] = {}
        try:
            import ray

            if idf is not None and isinstance(idf, ray.ObjectRef):
                idf = ray.get(idf)
            if payload is not None and isinstance(payload, ray.ObjectRef):
                payload = ray.get(payload)
            if isinstance(payload, list) and payload and isinstance(payload[0], ray.ObjectRef):
                # broadcast as materialized Arrow block refs (url, text,
                # canonical, house_nums, loc_toks): ZERO-COPY reads from
                # the object store, shared machine-wide.  No per-worker
                # Python dict — materializing 907k rows into a dict
                # measured 10.6s PER WORKER (x width, plus ~1 GB RSS and
                # GC churn each); instead keep the Arrow table itself and
                # build only a 16-byte/row hash index (vectorized polars
                # hash + argsort, ~0.2s), then gather per batch with
                # searchsorted + Table.take.
                objs = ray.get(payload)
                csr = None
                tables = []
                for o in objs:
                    if isinstance(o, tuple) and len(o) == 2:
                        # build_payload_index result: (sorted table, CSR
                        # index).  The index is row-aligned to ONE table,
                        # so only a single-ref payload can carry it.
                        o, icsr = o
                        if icsr is not None and len(objs) == 1:
                            csr = icsr
                    if o.num_rows:
                        tables.append(o)
                if tables:
                    # combine_chunks: the per-batch random gather
                    # (Table.take) on a ~blocks-chunked table pays a
                    # chunk binary-search + per-chunk copy per index;
                    # one contiguous copy per worker makes every take
                    # a flat gather
                    t = pa.concat_tables(tables).combine_chunks()
                    if "house_nums" not in t.column_names:
                        t = enrich_payload(t)
                    import os as _os

                    if _os.environ.get("RAY_GRAFT_PAYLOAD") == "dict":
                        # legacy per-worker dict (A/B knob): ~10s build +
                        # ~1 GB RSS per worker at 907k reps
                        payload = dict(
                            zip(
                                t["url"].to_pylist(),
                                zip(
                                    t["text"].to_pylist(),
                                    t["canonical"].to_pylist(),
                                    (tuple(x) for x in t["house_nums"].to_pylist()),
                                    (tuple(x) for x in t["loc_toks"].to_pylist()),
                                ),
                            )
                        )
                        self.payload = payload
                        self._pdict4 = True
                    else:
                        # the url-hash index is built LAZILY (first
                        # url-keyed batch): id-keyed pipelines never pay
                        # the per-worker polars hash + argsort
                        if "nid" in t.column_names:
                            # int-keyed pairs: direct searchsorted on the
                            # sorted nid column — no per-batch string
                            # hashing.  nid is a 63-bit md5 url
                            # fingerprint, so two distinct reps CAN
                            # collide (~n^2/2^64); a collision would
                            # silently merge identities across pairs,
                            # decisions and clusters, so detect it once
                            # here and fail loudly.
                            ids = t["nid"].to_numpy()
                            if len(ids) > 1 and bool(np.all(ids[1:] >= ids[:-1])):
                                # pre-sorted payload (combine_payload_blocks
                                # ran once, upstream): identity row map,
                                # no per-worker argsort
                                iorder = np.arange(len(ids), dtype=np.int64)
                                sorted_ids = ids
                            else:
                                iorder = np.argsort(ids, kind="stable")
                                sorted_ids = ids[iorder]
                            if len(sorted_ids) > 1 and bool(
                                (sorted_ids[1:] == sorted_ids[:-1]).any()
                            ):
                                dup = sorted_ids[:-1][sorted_ids[1:] == sorted_ids[:-1]]
                                raise ValueError(
                                    "nid fingerprint collision in scorer payload "
                                    f"({len(dup)} duplicate id(s), e.g. {int(dup[0])}): "
                                    "distinct rep urls share a 63-bit id; rerun with "
                                    "url-keyed pairs (broadcast payload without nid)"
                                )
                            self._pid_sorted = sorted_ids
                            self._pid_rows = iorder.astype(np.int64)
                        self._ptable = t
                        if (
                            csr is not None
                            and self._pid_sorted is not None
                            and csr.get("n") == t.num_rows
                        ):
                            self._csr = csr
                        payload = None
        except ValueError:
            raise  # nid collision guard must fail loudly, not fall back
        except Exception:
            pass
        # broadcast url -> (text, canonical) lookup (resolved ONCE per
        # actor); None = pairs carry their own payload columns
        self.payload: dict[str, tuple[str, str]] | None = payload
        self.idf: dict[str, float] = idf or {}
        self.default_idf = math.log(1 + max(1, n_docs)) + 1.0
        self.prod = prod or ProductionWeights()
        self.weights = weights or FeatureWeights()
        self.fidelity = fidelity
        self._duck = None
        if self.prod.native_jw:
            try:
                import duckdb

                self._duck = duckdb.connect()
                self._duck.execute("PRAGMA threads=1")
            except Exception:
                self._duck = None
        # per-actor caches: each distinct text participates in many pairs,
        # so token vectors / sets are computed once per TEXT, not per pair
        self._vec_cache: dict[str, tuple[dict, float]] = {}
        self._set_cache: dict[str, tuple[frozenset, tuple]] = {}
        # vectorized-path caches (see _tok_entry / _ts_tf_batch)
        self._entry_cache: dict[str, tuple] = {}
        self._tok_ids: dict[str, int] = {}
        # (token_a, token_b) -> within_one_edit verdict, worker-lifetime
        self._dl1_cache: dict[tuple[str, str], bool] = {}
        # house/locality tuple -> frozenset caches (see __call__)
        self._hset_cache: dict[tuple, frozenset] = {}
        self._lset_cache: dict[tuple, frozenset] = {}

    def _tok_vec(self, canon: str) -> tuple[dict, float]:
        """idf-weighted term vector + L2 norm, cached per canonical text."""
        v = self._vec_cache.get(canon)
        if v is None:
            if len(self._vec_cache) > self._CAP:
                self._vec_cache.clear()
            toks = canon.split(" ") if canon else []
            wv = {}
            for t, c in Counter(toks).items():
                wv[t] = c * self.idf.get(t, self.default_idf)
            norm = math.sqrt(sum(x * x for x in wv.values()))
            v = (wv, norm)
            self._vec_cache[canon] = v
        return v

    def _tok_set(self, canon: str) -> tuple[frozenset, tuple]:
        """(token set, fuzzy-eligible tokens) cached per canonical text."""
        v = self._set_cache.get(canon)
        if v is None:
            if len(self._set_cache) > self._CAP:
                self._set_cache.clear()
            sa = frozenset(canon.split(" ")) if canon else frozenset()
            rest = tuple(sorted(t for t in sa if t.isalpha() and len(t) >= 3))
            v = (sa, rest)
            self._set_cache[canon] = v
        return v

    def _tfidf_pair(self, ca: str, cb: str) -> float:
        wa, na = self._tok_vec(ca)
        wb, nb = self._tok_vec(cb)
        if not wa or not wb:
            return 1.0 if not wa and not wb else 0.0
        if len(wb) < len(wa):
            wa, wb = wb, wa
        dot = 0.0
        for t, x in wa.items():
            y = wb.get(t)
            if y is not None:
                dot += x * y
        if dot == 0.0 or na == 0.0 or nb == 0.0:
            return 0.0
        return dot / (na * nb)

    def _tok_entry(self, canon: str):
        """Vectorized-path per-text cache: sorted unique token-id array,
        aligned idf weights (count x idf), L2 norm, set size.  Token ids
        come from a per-worker grow-only dict (< 2^32 entries)."""
        v = self._entry_cache.get(canon)
        if v is None:
            # entries store token ids from _tok_ids, so the two caches
            # must reset ATOMICALLY: clearing only the entries would let
            # _tok_ids grow without bound across generations (heap leak),
            # and a vocabulary past 2^32 would silently corrupt the
            # packed (pair_idx << 32 | token_id) sort-merge keys.  The
            # id-space guard trips far below 2^32 as defense in depth.
            if len(self._entry_cache) > self._CAP or len(self._tok_ids) > (1 << 31):
                self._entry_cache.clear()
                self._tok_ids.clear()
            ids_map = self._tok_ids
            cnt = Counter(canon.split(" ")) if canon else Counter()
            n_set = len(cnt)
            ids = np.empty(n_set, dtype=np.uint64)
            w = np.empty(n_set, dtype=np.float64)
            for j, (t, c) in enumerate(cnt.items()):
                tid = ids_map.get(t)
                if tid is None:
                    tid = len(ids_map)
                    ids_map[t] = tid
                ids[j] = tid
                w[j] = c * self.idf.get(t, self.default_idf)
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            w = w[order]
            norm = math.sqrt(float((w * w).sum()))
            v = (ids, w, norm, n_set)
            self._entry_cache[canon] = v
        return v

    def _ts_tf_batch(self, can_a: list[str], can_b: list[str]):
        """Batched token-set ratio + TF-IDF cosine via ONE packed
        sort-merge: entries (pair_idx << 32 | token_id) from both sides
        are sorted; an equal adjacent duo is a cross-side token match
        (per-side ids are unique), yielding both the intersection count
        and the dot product without a per-pair Python loop.  Pairs whose
        containment is unsaturated AND that have fuzzy-eligible leftover
        tokens still take the scalar DL-1 rescue (exact semantics of
        ``_overlap_pair``); everything else is pure numpy.

        Parity: intersection counts are integers (exact); the dot is the
        same multiset of float products, summed by np.add.at instead of
        Python — differences are <= 1e-15 relative (float addition
        order), property-tested against the scalar pair functions.
        """
        n = len(can_a)
        entries_a = [self._tok_entry(c) for c in can_a]
        entries_b = [self._tok_entry(c) for c in can_b]
        la = np.fromiter((e[3] for e in entries_a), np.int64, n)
        lb = np.fromiter((e[3] for e in entries_b), np.int64, n)
        tot_a, tot_b = int(la.sum()), int(lb.sum())
        pack = np.empty(tot_a + tot_b, dtype=np.uint64)
        wvec = np.empty(tot_a + tot_b, dtype=np.float64)
        pair_rep_a = np.repeat(np.arange(n, dtype=np.uint64), la)
        pair_rep_b = np.repeat(np.arange(n, dtype=np.uint64), lb)
        if tot_a:
            pack[:tot_a] = (pair_rep_a << np.uint64(32)) | np.concatenate(
                [e[0] for e in entries_a]
            )
            wvec[:tot_a] = np.concatenate([e[1] for e in entries_a])
        if tot_b:
            pack[tot_a:] = (pair_rep_b << np.uint64(32)) | np.concatenate(
                [e[0] for e in entries_b]
            )
            wvec[tot_a:] = np.concatenate([e[1] for e in entries_b])
        order = np.argsort(pack, kind="stable")
        ps = pack[order]
        ws = wvec[order]
        eq = np.flatnonzero(ps[1:] == ps[:-1])
        common = np.zeros(n, dtype=np.int64)
        dot = np.zeros(n, dtype=np.float64)
        if len(eq):
            pidx = (ps[eq] >> np.uint64(32)).astype(np.int64)
            np.add.at(common, pidx, 1)
            np.add.at(dot, pidx, ws[eq] * ws[eq + 1])

        # token-set ratio
        ts = np.zeros(n, dtype=np.float64)
        both_empty = (la == 0) & (lb == 0)
        ts[both_empty] = 1.0
        live = (la > 0) & (lb > 0)
        denom = np.minimum(la, lb)
        with np.errstate(divide="ignore", invalid="ignore"):
            ts[live] = np.minimum(1.0, common[live] / denom[live])
        # fuzzy DL-1 rescue only where it can change the result
        maybe = np.flatnonzero(live & (common < denom))
        dl1 = self._dl1_cache
        for i in maybe.tolist():
            ca, cb = can_a[i], can_b[i]
            sa, rest_a_all = self._tok_set(ca)
            sb, rest_b_all = self._tok_set(cb)
            if not rest_a_all or not rest_b_all:
                continue
            # inline fuzzy_token_overlap's DL-1 rescue, reusing the
            # kernel's exact intersection count and a worker-level
            # (token, token) verdict cache — token pairs repeat across
            # thousands of candidate pairs, so each within_one_edit
            # evaluates once per worker, not once per pair
            rest_a = [t for t in rest_a_all if t not in sb]
            rest_b = [t for t in rest_b_all if t not in sa]
            extra = 0
            if rest_a and rest_b and len(rest_a) * len(rest_b) <= 64:
                used = [False] * len(rest_b)
                for ta in rest_a:
                    for j, tb in enumerate(rest_b):
                        if used[j] or abs(len(ta) - len(tb)) > 1:
                            continue
                        key = (ta, tb)
                        v = dl1.get(key)
                        if v is None:
                            if len(dl1) > self._CAP:
                                dl1.clear()
                            v = SS.within_one_edit(ta, tb)
                            dl1[key] = v
                        if v:
                            used[j] = True
                            extra += 1
                            break
            if extra:
                ts[i] = min(1.0, (int(common[i]) + extra) / int(denom[i]))

        # tf-idf cosine
        tf = np.zeros(n, dtype=np.float64)
        tf[both_empty] = 1.0
        na = np.fromiter((e[2] for e in entries_a), np.float64, n)
        nb = np.fromiter((e[2] for e in entries_b), np.float64, n)
        ok = (dot != 0.0) & (na != 0.0) & (nb != 0.0)
        tf[ok] = dot[ok] / (na[ok] * nb[ok])
        return ts, tf

    def _overlap_pair(self, ca: str, cb: str) -> float:
        """fuzzy_token_overlap with per-text cached sets."""
        sa, rest_a_all = self._tok_set(ca)
        sb, rest_b_all = self._tok_set(cb)
        if not sa or not sb:
            return 1.0 if not sa and not sb else 0.0
        common = len(sa & sb)
        denom = min(len(sa), len(sb))
        if common >= denom or not rest_a_all or not rest_b_all:
            # containment already saturated, or no fuzzy-eligible
            # leftovers on a side: the DL pass cannot change the result
            return min(1.0, common / denom)
        rest_a = [t for t in rest_a_all if t not in sb]
        rest_b = [t for t in rest_b_all if t not in sa]
        if rest_a and rest_b and len(rest_a) * len(rest_b) <= 64:
            used = [False] * len(rest_b)
            for ta in rest_a:
                for j, tb in enumerate(rest_b):
                    if used[j] or abs(len(ta) - len(tb)) > 1:
                        continue
                    if SS.within_one_edit(ta, tb):
                        used[j] = True
                        common += 1
                        break
        return min(1.0, common / denom)

    _EMPTY_ROW = ("", "", (), ())

    def _gather(self, urls) -> tuple[list, list, list, list]:
        """Payload lookup against the shared zero-copy Arrow table:
        hash the batch urls (same seeded polars hash as the index),
        binary-search the sorted index, then materialize the hit rows to
        Python tuples through a per-worker ROW CACHE — each payload row
        converts from Arrow exactly once per worker, on first touch
        (each text participates in ~tens of pairs; re-converting per
        batch measured 2.2x the whole stage, while an eager per-worker
        dict build cost 10.6s + ~1 GB RSS before the first batch).
        Misses (hash collisions / absent urls, verified by string
        equality on the uncached subset) fail safe to empty."""
        import polars as pl

        urls = urls.combine_chunks()
        n = len(urls)
        if self._ptable is None:
            return [""] * n, [""] * n, [()] * n, [()] * n
        if self._phash is None:
            # lazy url-hash index: only url-keyed pair batches pay for it
            hh = pl.from_arrow(self._ptable.select(["url"])).hash_rows(seed=7).to_numpy()
            order = np.argsort(hh, kind="stable")
            self._phash = hh[order]
            self._prow = order.astype(np.int64)
        if len(self._phash) == 0:
            return [""] * n, [""] * n, [()] * n, [()] * n
        h = pl.from_arrow(pa.table({"url": urls})).hash_rows(seed=7).to_numpy()
        pos = np.minimum(np.searchsorted(self._phash, h), len(self._phash) - 1)
        found = self._phash[pos] == h
        rows = self._prow[pos]
        cache = self._row_cache
        if len(cache) > self._CAP:
            cache.clear()
        need = [r for r in np.unique(rows[found]).tolist() if r not in cache]
        if need:
            idx = pa.array(need, pa.int64())
            sub_urls = self._ptable["url"].take(idx).to_pylist()
            sub_t = self._ptable["text"].take(idx).to_pylist()
            sub_c = self._ptable["canonical"].take(idx).to_pylist()
            sub_h = self._ptable["house_nums"].take(idx).to_pylist()
            sub_l = self._ptable["loc_toks"].take(idx).to_pylist()
            for j, r in enumerate(need):
                cache[r] = (sub_urls[j], sub_t[j], sub_c[j], tuple(sub_h[j]), tuple(sub_l[j]))
        e = self._EMPTY_ROW
        url_list = urls.to_pylist()
        rows_list = rows.tolist()
        found_list = found.tolist()
        out = []
        for i in range(n):
            if found_list[i]:
                row = cache.get(rows_list[i])
                # url equality guards 64-bit hash collisions: the cached
                # row carries its url; a mismatch is a miss
                if row is not None and row[0] == url_list[i]:
                    out.append(row[1:])
                    continue
            out.append(e)
        return (
            [v[0] for v in out],
            [v[1] for v in out],
            [v[2] for v in out],
            [v[3] for v in out],
        )

    def _gather_ids(self, ids) -> tuple[list, list, list, list]:
        """Int-keyed payload lookup: searchsorted directly on the sorted
        nid column (ids are exact row identities — no hashing and no
        collision guard).  Shares ``_row_cache`` with the url path."""
        ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
        vals = ids.to_numpy()
        n = len(vals)
        if self._pid_sorted is None or len(self._pid_sorted) == 0:
            return [""] * n, [""] * n, [()] * n, [()] * n
        pos = np.minimum(np.searchsorted(self._pid_sorted, vals), len(self._pid_sorted) - 1)
        found = self._pid_sorted[pos] == vals
        rows = self._pid_rows[pos]
        cache = self._row_cache
        if len(cache) > self._CAP:
            cache.clear()
        need = [r for r in np.unique(rows[found]).tolist() if r not in cache]
        if need:
            idx = pa.array(need, pa.int64())
            sub_urls = self._ptable["url"].take(idx).to_pylist()
            sub_t = self._ptable["text"].take(idx).to_pylist()
            sub_c = self._ptable["canonical"].take(idx).to_pylist()
            sub_h = self._ptable["house_nums"].take(idx).to_pylist()
            sub_l = self._ptable["loc_toks"].take(idx).to_pylist()
            for j, r in enumerate(need):
                cache[r] = (sub_urls[j], sub_t[j], sub_c[j], tuple(sub_h[j]), tuple(sub_l[j]))
        e = self._EMPTY_ROW
        rows_list = rows.tolist()
        found_list = found.tolist()
        out = []
        for i in range(n):
            row = cache.get(rows_list[i]) if found_list[i] else None
            out.append(row[1:] if row is not None else e)
        return (
            [v[0] for v in out],
            [v[1] for v in out],
            [v[2] for v in out],
            [v[3] for v in out],
        )

    def _match_csr(self, indptr, data, rows_a, rows_b, n):
        """Per-pair sorted-set intersection via ONE searchsorted: side-a
        packed keys (pair << 32 | id) are sorted BY CONSTRUCTION (pair
        index ascending, ids ascending within each CSR row), so the
        merge needs no argsort.  Returns everything the callers reuse."""
        idx_a, la = _csr_flat_idx(indptr, rows_a)
        idx_b, lb = _csr_flat_idx(indptr, rows_b)
        a_ids = data[idx_a].astype(np.uint64)
        b_ids = data[idx_b].astype(np.uint64)
        pra = np.repeat(np.arange(n, dtype=np.uint64), la)
        prb = np.repeat(np.arange(n, dtype=np.uint64), lb)
        a_keys = (pra << np.uint64(32)) | a_ids
        b_keys = (prb << np.uint64(32)) | b_ids
        if len(a_keys):
            pos = np.searchsorted(a_keys, b_keys)
            safe = np.minimum(pos, len(a_keys) - 1)
            eq = a_keys[safe] == b_keys
            pos = safe
        else:
            pos = np.zeros(len(b_keys), np.int64)
            eq = np.zeros(len(b_keys), bool)
        common = np.bincount(
            prb[eq].astype(np.int64), minlength=n
        ).astype(np.int64)
        return idx_a, idx_b, la, lb, pra, prb, pos, eq, common

    def _score_csr(self, batch: pa.Table) -> pa.Table:
        """Vectorized scorer over the broadcast CSR index: payload row
        lookup by searchsorted, then flat ragged gathers + one
        sort-merge per feature family.  No per-pair Python except the
        (rare) greedy DL-1 rescue, which runs only on pairs where both
        sides still have unmatched fuzzy-eligible tokens.  Semantics are
        bit-identical to the scalar kernels (property-tested)."""
        csr = self._csr
        nrows = csr["n"]
        n = batch.num_rows
        vals_a = np.asarray(batch["id_a"].to_numpy(zero_copy_only=False))
        vals_b = np.asarray(batch["id_b"].to_numpy(zero_copy_only=False))

        def _rows(vals):
            if len(self._pid_sorted) == 0:
                return np.full(len(vals), nrows, np.int64)
            pos = np.minimum(
                np.searchsorted(self._pid_sorted, vals), len(self._pid_sorted) - 1
            )
            found = self._pid_sorted[pos] == vals
            # misses (salting sentinels, dangling ids) -> the synthetic
            # empty row at index n (every *_indptr has n+2 entries)
            return np.where(found, self._pid_rows[pos], nrows)

        rows_a = _rows(vals_a)
        rows_b = _rows(vals_b)

        # --- token-set ratio + tf-idf cosine -------------------------
        idx_a, idx_b, la, lb, pra, prb, pos, eq, common = self._match_csr(
            csr["tok_indptr"], csr["tok_ids"], rows_a, rows_b, n
        )
        w_a = csr["tok_w"][idx_a]
        w_b = csr["tok_w"][idx_b]
        dot = np.bincount(
            prb[eq].astype(np.int64), weights=w_a[pos[eq]] * w_b[eq], minlength=n
        )
        ts = np.zeros(n, dtype=np.float64)
        both_empty = (la == 0) & (lb == 0)
        ts[both_empty] = 1.0
        live = (la > 0) & (lb > 0)
        denom = np.minimum(la, lb)
        with np.errstate(divide="ignore", invalid="ignore"):
            ts[live] = np.minimum(1.0, common[live] / denom[live])
        tf = np.zeros(n, dtype=np.float64)
        tf[both_empty] = 1.0
        na = csr["tok_norm"][rows_a]
        nb = csr["tok_norm"][rows_b]
        ok = (dot != 0.0) & (na != 0.0) & (nb != 0.0)
        tf[ok] = dot[ok] / (na[ok] * nb[ok])

        # --- greedy DL-1 rescue (exact _overlap_pair semantics) ------
        unsat = live & (common < denom)
        if unsat.any():
            isrest = csr["tok_isrest"]
            matched_a = np.zeros(len(idx_a), bool)
            matched_a[pos[eq]] = True
            fa_m = isrest[csr["tok_ids"][idx_a].astype(np.int64)] & ~matched_a
            fb_m = isrest[csr["tok_ids"][idx_b].astype(np.int64)] & ~eq
            cnt_a = np.bincount(pra[fa_m].astype(np.int64), minlength=n)
            cnt_b = np.bincount(prb[fb_m].astype(np.int64), minlength=n)
            need = np.flatnonzero(unsat & (cnt_a > 0) & (cnt_b > 0) & (cnt_a * cnt_b <= 64))
            if len(need):
                fa_ids = csr["tok_ids"][idx_a[fa_m]].astype(np.int64)
                fa_pairs = pra[fa_m].astype(np.int64)
                fb_ids = csr["tok_ids"][idx_b[fb_m]].astype(np.int64)
                fb_pairs = prb[fb_m].astype(np.int64)
                a_lo = np.searchsorted(fa_pairs, need)
                a_hi = np.searchsorted(fa_pairs, need + 1)
                b_lo = np.searchsorted(fb_pairs, need)
                b_hi = np.searchsorted(fb_pairs, need + 1)
                dl1keys = csr.get("dl1")
                if dl1keys is not None:
                    # vectorized verdicts: ONE ragged cross-product key
                    # build + ONE searchsorted over the precomputed
                    # verified-DL1 key array for every needy pair
                    # (<= 64 keys each); the greedy walk then touches
                    # only Python bools with the scalar iteration ORDER
                    # preserved exactly (first unused b-token per
                    # a-token, fa/fb slice order) — the length filter
                    # is subsumed by verification at index build
                    a_cnt = (a_hi - a_lo).astype(np.int64)
                    b_cnt = (b_hi - b_lo).astype(np.int64)
                    sizes = a_cnt * b_cnt
                    bounds = np.concatenate([[0], np.cumsum(sizes)])
                    total = int(bounds[-1])
                    pk = np.repeat(np.arange(len(need), dtype=np.int64), sizes)
                    woff = np.arange(total, dtype=np.int64) - bounds[pk]
                    A = fa_ids[a_lo[pk] + woff // b_cnt[pk]].astype(np.uint64)
                    B = fb_ids[b_lo[pk] + woff % b_cnt[pk]].astype(np.uint64)
                    flat = (A << np.uint64(32)) | B
                    pos = np.searchsorted(dl1keys, flat)
                    hit = np.zeros(total, bool)
                    inb = pos < len(dl1keys)
                    hit[inb] = dl1keys[pos[inb]] == flat[inb]
                    # pairs with zero hits can't change ts — skip their
                    # greedy walk entirely (the common case)
                    any_hit = np.bincount(pk[hit], minlength=len(need)) > 0
                    hit_l = hit.tolist()
                    bnd_l = bounds.tolist()
                    na_l = a_cnt.tolist()
                    nb_l = b_cnt.tolist()
                    for k in np.flatnonzero(any_hit).tolist():
                        i = int(need[k])
                        bc = nb_l[k]
                        base = bnd_l[k]
                        used = [False] * bc
                        extra = 0
                        for x in range(na_l[k]):
                            row = base + x * bc
                            for j in range(bc):
                                if hit_l[row + j] and not used[j]:
                                    used[j] = True
                                    extra += 1
                                    break
                        if extra:
                            ts[i] = min(1.0, (int(common[i]) + extra) / int(denom[i]))
                else:
                    # adversarial-vocab fallback: scalar kernel with
                    # per-worker (token, token) verdict cache
                    tok_len = csr["tok_len"]
                    vocab = csr["vocab"]
                    vs = self._vocab_str
                    dl1 = self._dl1_cache
                    for k in range(len(need)):
                        i = int(need[k])
                        ta_list = fa_ids[a_lo[k] : a_hi[k]].tolist()
                        tb_list = fb_ids[b_lo[k] : b_hi[k]].tolist()
                        used = [False] * len(tb_list)
                        extra = 0
                        for ta in ta_list:
                            lta = int(tok_len[ta])
                            for j, tb in enumerate(tb_list):
                                if used[j] or abs(lta - int(tok_len[tb])) > 1:
                                    continue
                                key = (ta, tb)
                                v = dl1.get(key)
                                if v is None:
                                    if len(dl1) > self._CAP:
                                        dl1.clear()
                                    sa = vs.get(ta)
                                    if sa is None:
                                        if len(vs) > self._CAP:
                                            vs.clear()
                                        sa = vs[ta] = vocab[ta].as_py()
                                    sb = vs.get(tb)
                                    if sb is None:
                                        sb = vs[tb] = vocab[tb].as_py()
                                    v = SS.within_one_edit(sa, sb)
                                    dl1[key] = v
                                if v:
                                    used[j] = True
                                    extra += 1
                                    break
                        if extra:
                            ts[i] = min(1.0, (int(common[i]) + extra) / int(denom[i]))

        # --- house-number veto (P6) ----------------------------------
        _, _, ha_n, hb_n, _, _, _, _, hcommon = self._match_csr(
            csr["house_indptr"], csr["house_ids"], rows_a, rows_b, n
        )
        both_house = (ha_n > 0) & (hb_n > 0)
        same_house = both_house & (hcommon > 0)
        veto = both_house & (hcommon == 0)

        # --- locality overlap (D2): set(a) membership, LIST lengths ---
        ll = csr["locl_indptr"]
        la_list = ll[rows_a + 1] - ll[rows_a]
        lb_list = ll[rows_b + 1] - ll[rows_b]
        sidx_a, _ = _csr_flat_idx(csr["locs_indptr"], rows_a)
        lidx_b, lb_cnt = _csr_flat_idx(ll, rows_b)
        sa_ids = csr["locs_ids"][sidx_a].astype(np.uint64)
        lb_ids = csr["locl_ids"][lidx_b].astype(np.uint64)
        pr_sa = np.repeat(
            np.arange(n, dtype=np.uint64),
            csr["locs_indptr"][rows_a + 1] - csr["locs_indptr"][rows_a],
        )
        pr_lb = np.repeat(np.arange(n, dtype=np.uint64), lb_cnt)
        sa_keys = (pr_sa << np.uint64(32)) | sa_ids
        lb_keys = (pr_lb << np.uint64(32)) | lb_ids
        if len(sa_keys):
            lpos = np.minimum(np.searchsorted(sa_keys, lb_keys), len(sa_keys) - 1)
            leq = sa_keys[lpos] == lb_keys
        else:
            leq = np.zeros(len(lb_keys), bool)
        lcount = np.bincount(pr_lb[leq].astype(np.int64), minlength=n)
        loc_overlap = np.zeros(n, dtype=np.float64)
        loc_overlap[(la_list == 0) & (lb_list == 0)] = 1.0
        lboth = (la_list > 0) & (lb_list > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            loc_overlap[lboth] = lcount[lboth] / np.minimum(la_list, lb_list)[lboth]

        # --- Jaro-Winkler on the precomputed truncated canonicals -----
        rows_pa_a = pa.array(rows_a, pa.int64())
        rows_pa_b = pa.array(rows_b, pa.int64())
        if csr["mjl"] == self.prod.max_jw_len:
            ta_arr = csr["trunc"].take(rows_pa_a)
            tb_arr = csr["trunc"].take(rows_pa_b)
        else:
            mjl = self.prod.max_jw_len
            can = pc.fill_null(self._ptable["canonical"], "")
            ta_arr = pa.array(
                [("" if r == nrows else can[r].as_py())[:mjl] for r in rows_a.tolist()]
            )
            tb_arr = pa.array(
                [("" if r == nrows else can[r].as_py())[:mjl] for r in rows_b.tolist()]
            )
        if self._duck is not None:
            _jwt = pa.table({"a": ta_arr, "b": tb_arr})
            jw = (
                self._duck.execute("SELECT jaro_winkler_similarity(a, b) AS jw FROM _jwt")
                .arrow()["jw"]
                .to_numpy()
            )
        else:
            jw = S.jaro_winkler_batch(ta_arr.to_pylist(), tb_arr.to_pylist())

        w = self.prod
        score = w.jaro_winkler * jw + w.token_set * ts + w.tfidf_cosine * tf
        is_edge = (score >= w.edge_threshold) & ~veto
        sent = vals_a == -1
        if sent.any():
            is_edge &= ~sent

        cols: dict = {
            "id_a": batch["id_a"],
            "id_b": batch["id_b"],
            "jaro_winkler": pa.array(jw),
            "token_set_ratio": pa.array(ts),
            "tfidf_cosine": pa.array(tf),
            "house_veto": pa.array(veto),
            "has_same_house_num": pa.array(same_house),
            "locality_overlap": pa.array(loc_overlap),
            "score": pa.array(score),
            "is_edge": pa.array(is_edge),
        }
        if "dropped_pairs" in batch.column_names:
            cols["dropped_pairs"] = batch["dropped_pairs"]
        return pa.table(cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        id_mode = "id_a" in batch.column_names
        if (
            id_mode
            and self._csr is not None
            and self._pid_sorted is not None
            and not self.fidelity
            and self.prod.formula != "alt"
        ):
            return self._score_csr(batch)
        a_col, b_col = ("id_a", "id_b") if id_mode else ("url_a", "url_b")
        url_a = batch[a_col]
        url_b = batch[b_col]
        house_a = house_b = loc_a = loc_b = None
        if self._ptable is not None:
            gather = self._gather_ids if id_mode and self._pid_sorted is not None else self._gather
            text_a, can_a, house_a, loc_a = gather(url_a)
            text_b, can_b, house_b, loc_b = gather(url_b)
        elif self.payload is not None and getattr(self, "_pdict4", False):
            lut = self.payload
            empty = ("", "", (), ())
            pa_ = [lut.get(u, empty) for u in url_a.to_pylist()]
            pb_ = [lut.get(u, empty) for u in url_b.to_pylist()]
            text_a = [v[0] for v in pa_]
            can_a = [v[1] for v in pa_]
            house_a = [v[2] for v in pa_]
            loc_a = [v[3] for v in pa_]
            text_b = [v[0] for v in pb_]
            can_b = [v[1] for v in pb_]
            house_b = [v[2] for v in pb_]
            loc_b = [v[3] for v in pb_]
        elif self.payload is not None:
            lut = self.payload
            empty = ("", "")
            pa_ = [lut.get(u, empty) for u in url_a.to_pylist()]
            pb_ = [lut.get(u, empty) for u in url_b.to_pylist()]
            text_a = [t for t, _ in pa_]
            can_a = [c for _, c in pa_]
            text_b = [t for t, _ in pb_]
            can_b = [c for _, c in pb_]
        else:
            text_a = batch["text_a"].to_pylist()
            text_b = batch["text_b"].to_pylist()
            can_a = batch["canonical_a"].to_pylist()
            can_b = batch["canonical_b"].to_pylist()
        n = len(text_a)

        ts = np.empty(n, dtype=np.float64)
        tf = np.empty(n, dtype=np.float64)
        veto = np.zeros(n, dtype=bool)
        same_house = np.zeros(n, dtype=bool)
        loc_overlap = np.zeros(n, dtype=np.float64)

        mjl = self.prod.max_jw_len
        ta_trunc = [c[:mjl] for c in can_a]
        tb_trunc = [c[:mjl] for c in can_b]
        if self._duck is not None:
            _jwt = pa.table({"a": pa.array(ta_trunc, pa.string()), "b": pa.array(tb_trunc, pa.string())})
            jw = (
                self._duck.execute(
                    "SELECT jaro_winkler_similarity(a, b) AS jw FROM _jwt"
                )
                .arrow()["jw"]
                .to_numpy()
            )
        else:
            # batched numpy Jaro-Winkler (bit-identical to the scalar
            # port, which stays as the parity oracle — tests/test_strings)
            jw = S.jaro_winkler_batch(ta_trunc, tb_trunc)
        pre = house_a is not None
        import os as _os

        if _os.environ.get("RAY_GRAFT_VEC_OVERLAP", "1") == "1":
            ts, tf = self._ts_tf_batch(can_a, can_b)
            vec_tstf = True
        else:
            vec_tstf = False
        # per-tuple set caches (worker-lifetime): house/locality tuples
        # repeat across thousands of pairs, so the uppercase-set build
        # inside has_common_element / token_overlap runs once per
        # distinct tuple instead of once per pair (semantics identical)
        hsets = self._hset_cache
        lsets = self._lset_cache

        def _hset(tup):
            v = hsets.get(tup)
            if v is None:
                if len(hsets) > self._CAP:
                    hsets.clear()
                v = frozenset(x.upper() for x in tup)
                hsets[tup] = v
            return v

        def _lset(tup):
            v = lsets.get(tup)
            if v is None:
                if len(lsets) > self._CAP:
                    lsets.clear()
                v = frozenset(tup)
                lsets[tup] = v
            return v

        for i in range(n):
            ca, cb = can_a[i], can_b[i]
            if not vec_tstf:
                ts[i] = self._overlap_pair(ca, cb)
                tf[i] = self._tfidf_pair(ca, cb)
            if pre:
                ha, hb, la, lb = house_a[i], house_b[i], loc_a[i], loc_b[i]
            else:
                ha = _house_numbers_cached(text_a[i])
                hb = _house_numbers_cached(text_b[i])
                la = _locality_tokens_cached(text_a[i])
                lb = _locality_tokens_cached(text_b[i])
            # == has_common_element(list(ha), list(hb)) on cached sets
            common = bool(ha and hb) and not _hset(tuple(ha)).isdisjoint(_hset(tuple(hb)))
            veto[i] = bool(ha and hb) and not common
            # D2 medium-tier inputs, carried through the scored schema so
            # the distributed decide can evaluate the 0.88 tier
            # (scorer.go:177-188)
            same_house[i] = common
            # == N.token_overlap(list(la), list(lb)) with a cached set1
            if not la and not lb:
                loc_overlap[i] = 1.0
            elif not la or not lb:
                loc_overlap[i] = 0.0
            else:
                s1 = _lset(tuple(la))
                loc_overlap[i] = sum(1 for t in lb if t in s1) / min(len(la), len(lb))

        w = self.prod
        if w.formula == "alt":
            # P3 alternative fuzzy blend: needs the full feature set per
            # pair (trigram, phonetics, house/street components), so this
            # path pays the per-pair feature computation — it is the
            # parity/experimentation engine, not the throughput path
            score = np.empty(n, dtype=np.float64)
            for i in range(n):
                feats = F.compute_pair_features(
                    text_a[i], can_a[i], can_a[i].split(" ") if can_a[i] else [],
                    text_b[i], can_b[i], can_b[i].split(" ") if can_b[i] else [],
                )
                score[i] = F.score_features_alt(feats)
        else:
            score = w.jaro_winkler * jw + w.token_set * ts + w.tfidf_cosine * tf
        is_edge = (score >= w.edge_threshold) & ~veto
        # salting sentinel rows (id -1 / url "") exist only to carry a
        # block's dropped_pairs count when it kept zero pairs; they score
        # against empty payload rows (ts=tf=1.0) and would otherwise emit
        # a spurious self-loop edge.  Never an edge; accounting preserved.
        if id_mode:
            sent = url_a.to_numpy(zero_copy_only=False) == -1
        else:
            sent = np.fromiter((u == "" for u in url_a.to_pylist()), bool, n)
        if sent.any():
            is_edge &= ~sent

        cols: dict = {
            a_col: url_a,
            b_col: url_b,
            "jaro_winkler": pa.array(jw),
            "token_set_ratio": pa.array(ts),
            "tfidf_cosine": pa.array(tf),
            "house_veto": pa.array(veto),
            "has_same_house_num": pa.array(same_house),
            "locality_overlap": pa.array(loc_overlap),
            "score": pa.array(score),
            "is_edge": pa.array(is_edge),
        }
        if "dropped_pairs" in batch.column_names:
            cols["dropped_pairs"] = batch["dropped_pairs"]

        if self.fidelity:
            ref_scores = np.empty(n, dtype=np.float64)
            trigram = np.empty(n, dtype=np.float64)
            emb = np.empty(n, dtype=np.float64)
            for i in range(n):
                feats = F.compute_pair_features(
                    text_a[i], can_a[i], can_a[i].split(" ") if can_a[i] else [],
                    text_b[i], can_b[i], can_b[i].split(" ") if can_b[i] else [],
                )
                trigram[i] = feats["trigram_similarity"]
                emb[i] = feats["embedding_cosine"]
                ref_scores[i] = F.score_features(feats, self.weights)
            cols["trigram_similarity"] = pa.array(trigram)
            cols["embedding_cosine"] = pa.array(emb)
            cols["ref_score"] = pa.array(ref_scores)

        return pa.table(cols)


def score_pairs(
    pairs_ds,
    idf_ref=None,
    n_docs: int = 1,
    prod: ProductionWeights | None = None,
    fidelity: bool = False,
    concurrency=(1, 8),
    batch_size: int = 8192,
    payload_ref=None,
    task_based: bool = True,
):
    """pairs Dataset -> scored-pairs Dataset.

    The pair table arrives in one block per shuffle partition (8 by
    default); map_batches hands one BLOCK per task, so without resplitting
    parallelism would be capped at 8 concurrent tasks regardless of
    cluster size (measured: 81 s vs 27 s on 32 CPUs).  Split to
    batch-sized blocks first — a metadata-only operation, no shuffle.

    ``task_based=True`` (default) runs the scorer as plain map_batches
    TASKS with the per-worker state cache (rayutil.worker_cached): warm
    worker processes skip the actor pool's spawn+import floor, and the
    broadcast idf/payload refs resolve from the local object store once
    per worker.  ``task_based=False`` keeps the actor-pool path (an
    explicit pool with sized reservations — the right choice when the
    stage must coexist with other heavy pools)."""
    # block = 4 batches: each task processes one BLOCK (slicing it into
    # batch_size calls internally), so block size trades per-task
    # dispatch overhead against load balance; 4x keeps tasks ~2-3s
    pairs_ds = pairs_ds.repartition(target_num_rows_per_block=batch_size * 4)
    if task_based:
        from ..rayutil import ref_token, worker_cached

        token = ref_token(idf_ref, payload_ref, prod, n_docs, fidelity)

        def _score(batch: pa.Table) -> pa.Table:
            scorer = worker_cached(
                "pair_scorer",
                token,
                lambda: PairScorer(
                    idf=idf_ref, n_docs=n_docs, prod=prod, fidelity=fidelity, payload=payload_ref
                ),
            )
            return scorer(batch)

        return pairs_ds.map_batches(_score, batch_format="pyarrow", batch_size=batch_size)
    # fractional CPU per actor: the pool coexists with its feeder tasks
    # (pair enumeration, streaming repartition) and shuffle aggregators;
    # full-CPU actors at the cap would reserve the whole cluster and
    # starve the feeders (observed ~55% pool utilization with integer
    # reservations).  0.8 CPU x a cap slightly above the cluster width
    # keeps every core busy while leaving scheduler headroom.
    if isinstance(concurrency, tuple):
        lo, hi = concurrency
        concurrency = (lo, max(hi, int(hi * 1.2)))
    return pairs_ds.map_batches(
        PairScorer,
        fn_constructor_kwargs=dict(
            idf=idf_ref, n_docs=n_docs, prod=prod, fidelity=fidelity, payload=payload_ref
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.7,
    )
