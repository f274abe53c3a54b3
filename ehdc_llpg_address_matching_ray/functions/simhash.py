"""SimHash fingerprints for near-duplicate detection.

64-bit SimHash over md5-low64 token hashes (Charikar 2002, the standard
web-dedup sketch).  A training-data-pipeline operator beyond the
reference's inventory (SURVEY.md §2 extension list).

Token hash = big-endian top 8 bytes of md5(token) — chosen because it is
bit-replicable in ANSI-ish SQL (DuckDB: ``('0x' ||
substr(md5(tok),1,16))::UBIGINT``), which gives the simhash query a
value-exact oracle.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np


@lru_cache(maxsize=1 << 20)
def _tok_hash(t: str) -> int:
    """md5-low64 token hash, cached — natural-language tokens repeat
    heavily across documents."""
    return int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big")


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash of a token list (md5-low64 token hashes;
    sign-accumulated bit votes, ties vote 0)."""
    if not tokens:
        return 0
    hs = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        hs[i] = _tok_hash(t)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for j in range(64):
        if votes[j] > 0:
            out |= np.uint64(1) << np.uint64(j)
    return int(out)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_batch(token_lists: list[list[str]]) -> np.ndarray:
    return np.array([simhash64(t) for t in token_lists], dtype=np.uint64)
