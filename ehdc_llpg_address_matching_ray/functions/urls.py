"""URL canonicalization for web-corpus dedup.

The classic first dedup pass over a crawl (before any content hashing)
is URL-level: the same page is fetched as `HTTP://WWW.Site.COM:80/a//b/
?utm_source=feed&b=2&a=1#top` and `http://site.com/a/b?a=1&b=2`.
``canonical_url_batch`` normalizes a whole Arrow column at once:

  1. drop the fragment,
  2. lowercase scheme + authority (path/query case is preserved),
  3. strip default ports (:80 for http, :443 for https),
  4. strip a leading ``www.`` label,
  5. collapse duplicate slashes in the path and trim a trailing slash,
  6. drop tracking params (utm_*, fbclid, gclid, msclkid), sort the
     rest, and re-join.

All regex steps are RE2-compatible (no lookaround) so the DuckDB oracle
twin applies the identical expressions.  Steps 1-5 are pure Arrow
kernels; step 6 sorts the exploded param list with one pandas
(row, value) mergesort and re-joins per row — O(total params), no
per-URL Python in the regex path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid)(=.*)?$"
# scheme://authority — everything up to the first /, ? or # after ://
_HEAD_RE = r"^([^:/?#]+://[^/?#]*)"


def _sort_join_params(query: pa.Array) -> pa.Array:
    """Per-row: split on '&', drop tracking/empty params, sort, re-join.
    Null/empty query -> empty string."""
    q = pc.fill_null(query, "")
    parts = pc.split_pattern(q, "&")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    flat = parts.flatten()
    offsets = parts.offsets.to_numpy(zero_copy_only=False)
    rows = np.repeat(np.arange(len(parts)), np.diff(offsets))
    keep = pc.and_(
        pc.invert(pc.match_substring_regex(flat, _TRACKING_RE)),
        pc.not_equal(flat, ""),
    ).to_numpy(zero_copy_only=False)
    kept_rows = rows[keep]
    # one Arrow C++ sort orders every row's surviving params (strings
    # never leave Arrow — the previous pandas detour copied the whole
    # flat param column into Python objects); the re-join is Arrow's
    # vectorized binary_join over a rebuilt ListArray
    kept_vals = flat.filter(pa.array(keep))
    order = pc.sort_indices(
        pa.table({"r": pa.array(kept_rows), "v": kept_vals}),
        sort_keys=[("r", "ascending"), ("v", "ascending")],
    )
    off = np.zeros(len(parts) + 1, dtype=np.int32)
    np.cumsum(np.bincount(kept_rows, minlength=len(parts)), out=off[1:])
    la = pa.ListArray.from_arrays(pa.array(off), kept_vals.take(order))
    return pc.binary_join(la, "&")


def canonical_url_batch(urls: pa.Array) -> pa.Array:
    """Vectorized canonical form of a URL column (see module docstring)."""
    orig = pc.fill_null(urls, "")
    # 1. fragment
    u = pc.replace_substring_regex(orig, "#.*$", "")
    # 2. split head (scheme://authority) from tail; lowercase the head
    head = pc.utf8_lower(
        pc.replace_substring_regex(u, _HEAD_RE + r"(?:[/?#].*)?$", r"\1")
    )
    tail = pc.replace_substring_regex(u, _HEAD_RE, "")
    # 3. default ports (head is already lowercase)
    head = pc.replace_substring_regex(head, r"^http://([^/?#]*):80$", r"http://\1")
    head = pc.replace_substring_regex(head, r"^https://([^/?#]*):443$", r"https://\1")
    # 4. www.
    head = pc.replace_substring_regex(head, r"^(https?://)www\.", r"\1")
    # 5. path: collapse // runs, trim trailing slash (keep a bare "/")
    path = pc.replace_substring_regex(tail, r"\?.*$", "")
    path = pc.replace_substring_regex(path, "/{2,}", "/")
    path = pc.replace_substring_regex(path, "(.)/$", r"\1")
    # 6. query params
    has_q = pc.match_substring_regex(tail, r"\?")
    query = _sort_join_params(pc.replace_substring_regex(tail, r"^[^?]*\??", ""))
    qmark = pc.if_else(
        pc.and_(has_q, pc.not_equal(query, "")), pa.scalar("?"), pa.scalar("")
    )
    canon = pc.binary_join_element_wise(head, path, qmark, query, "")
    # a string without :// has no authority to normalize — pass the ORIGINAL
    # through untouched (fragment included) rather than mis-splitting it
    return pc.if_else(pc.match_substring(orig, "://"), canon, orig)
