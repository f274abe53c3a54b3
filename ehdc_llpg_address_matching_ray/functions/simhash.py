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
    """Vectorized batch SimHash, value-identical to ``simhash64`` per row
    (property-tested).

    The r2 kernel ran per-document Python (a (len x 64) int64 broadcast
    plus a 64-iteration bit loop per doc).  Here md5 runs ONCE per
    DISTINCT token in the chunk (the lru cache carries hits across
    calls), votes dedup to (doc, token) pairs with counts, and the
    per-bit sign votes accumulate through 64 contiguous 1-D
    gather/bincount passes.  Chunked over docs so the pair arrays stay
    in the cache-friendly regime (large single allocations measured
    superlinear on this substrate)."""
    n_docs = len(token_lists)
    if n_docs == 0:
        return np.zeros(0, dtype=np.uint64)
    # ~1M token instances per chunk
    out = np.empty(n_docs, dtype=np.uint64)
    pos = 0
    while pos < n_docs:
        hi = pos
        tot = 0
        while hi < n_docs and (tot == 0 or tot + len(token_lists[hi]) <= (1 << 20)):
            tot += len(token_lists[hi])
            hi += 1
        out[pos:hi] = _simhash_chunk(token_lists[pos:hi])
        pos = hi
    return out


def _simhash_chunk(token_lists: list[list[str]]) -> np.ndarray:
    n_docs = len(token_lists)
    out = np.zeros(n_docs, dtype=np.uint64)
    lengths = np.fromiter((len(t) for t in token_lists), np.int64, n_docs)
    flat = [t for lst in token_lists for t in lst]
    if not flat:
        return out
    import pandas as pd

    codes, uniq = pd.factorize(np.asarray(flat, dtype=object))
    U = len(uniq)
    uh = np.fromiter((_tok_hash(t) for t in uniq.tolist()), np.uint64, U)
    # +-1 vote rows per DISTINCT token via unpackbits (C-speed; uint64 is
    # little-endian on every supported platform, so bitorder='little'
    # over the byte view puts bit j of the hash in column j)
    pm = (
        2.0 * np.unpackbits(uh[:, None].view(np.uint8), axis=1, bitorder="little") - 1.0
    )
    # dedup to (doc, token) PAIRS with counts: natural-language tokens
    # repeat within documents, and the expensive per-row work below is
    # O(pairs x 64), not O(token instances x 64)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
    key = doc_of * U + codes
    order = np.argsort(key, kind="stable")
    ks = key[order]
    kstarts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
    cnt = np.diff(np.r_[kstarts, len(ks)]).astype(np.float64)
    pk = ks[kstarts]
    doc_t = pk // U
    code_t = pk % U
    # per-bit count-weighted vote accumulation: 64 one-dimensional
    # (gather, multiply, bincount) passes over the PAIR rows.  Wide-row
    # gathers (pm[code_t] as one (pairs x 64) fancy index) measured
    # ~10x slower than these contiguous 1-D column passes; float64 sums
    # of integer votes are exact below 2^53.
    pmf = np.asfortranarray(pm)
    votes = np.empty((n_docs, 64), dtype=np.float64)
    for j in range(64):
        votes[:, j] = np.bincount(
            doc_t, weights=cnt * np.take(pmf[:, j], code_t), minlength=n_docs
        )
    shifts = np.arange(64, dtype=np.uint64)
    bits_set = (votes > 0).astype(np.uint64)
    out = (bits_set << shifts[None, :]).sum(axis=1, dtype=np.uint64)
    out[lengths == 0] = 0
    return out
