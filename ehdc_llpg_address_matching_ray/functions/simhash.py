"""SimHash fingerprints for near-duplicate detection.

64-bit SimHash over crc32 token hashes (Charikar 2002, the standard
web-dedup sketch).  A training-data-pipeline operator beyond the
reference's inventory (SURVEY.md §2 extension list).
"""

from __future__ import annotations

import zlib

import numpy as np


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash of a token list (crc32 token hashes folded to 64
    bits via FNV; sign-accumulated bit votes)."""
    if not tokens:
        return 0
    hs = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        bt = t.encode("utf-8")
        lo = zlib.crc32(bt)
        hi = zlib.crc32(bt, 0x9E3779B9)
        hs[i] = (np.uint64(hi) << np.uint64(32)) | np.uint64(lo)
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
