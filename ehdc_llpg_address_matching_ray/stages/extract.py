"""HTML → text extraction + canonicalization — the stateless head stage.

Reference analogue: ``load-sources`` + ``updateCanonicalAddresses``
(internal/etl/pipeline.go:577-630) — the reference reads CSVs and
canonicalizes per row; here the source is Common-Crawl-shaped pages and
the invariant is byte-identical extracted text per url
(BASELINE.json input_hint), asserted in tests against the ``text``
column the corpus carries.

Both functions are pure Arrow (RE2 kernels) — zero Python row loops.
The html column is projected away by ``normalize_pages`` so the wide
binary payload never enters a shuffle (SURVEY.md §7.5).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions import normalize as N
from ..functions import textstats as TS

# The corpus generator wraps the payload as <p>PAYLOAD</p> with html
# entities escaped.  Extraction = take first <p>…</p>, strip any nested
# tags, unescape the three entities html.escape(quote=False) produces.
_P_BODY = r"(?s)<p>(?P<body>.*?)</p>"


def extract_text_batch(html_col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Extract the payload text from the html binary column (vectorized)."""
    s = html_col.cast(pa.string())
    body = pc.struct_field(pc.extract_regex(s, _P_BODY), "body")
    body = pc.coalesce(body, "")
    body = pc.replace_substring_regex(body, r"<[^>]*>", "")
    # reverse html.escape(quote=False): &amp; LAST so sequences like
    # "&amp;lt;" round-trip exactly the way html.unescape would not —
    # escape order is &->&amp; first, so unescape must do &amp; last.
    body = pc.replace_substring(body, "&lt;", "<")
    body = pc.replace_substring(body, "&gt;", ">")
    body = pc.replace_substring(body, "&amp;", "&")
    return body


def extract_pages(batch: pa.Table) -> pa.Table:
    """map_batches fn: adds ``extracted_text`` from ``html``."""
    return batch.append_column("extracted_text", extract_text_batch(batch["html"]))


def normalize_pages(batch: pa.Table) -> pa.Table:
    """map_batches fn: pages -> NORMALIZED schema (html dropped).

    Canonicalization is the reference normalizer (M1) applied to the
    page text; ``code`` is the extracted postcode-like token and
    ``text_hash`` the md5 of the canonical form (the exact-dup key,
    G3/J2 analogue).
    """
    text = batch["text"]
    canonical, code = N.canonical_batch(text)
    n_tokens = TS.whitespace_token_count(canonical).cast(pa.int32())
    text_hash = pa.array(TS.md5_hex(canonical.to_pylist()), pa.string())
    cols = {
        "url": batch["url"],
        "text": text,
        "lang": batch["lang"],
        "canonical": canonical,
        "code": code,
        "text_hash": text_hash,
        "n_tokens": n_tokens,
    }
    return pa.table(cols)


def extract_and_normalize(batch: pa.Table) -> pa.Table:
    """Fused head stage: html -> extracted text -> canonical columns.

    Uses the EXTRACTED text (not the carried ``text`` column) as the
    engine's source of truth; the byte-identity test asserts the two are
    equal per url on the synthetic corpus.
    """
    extracted = extract_text_batch(batch["html"])
    tmp = pa.table(
        {
            "url": batch["url"],
            "text": extracted,
            "lang": batch["lang"],
        }
    )
    return normalize_pages(tmp)
