"""Mergeable streaming sketches: HyperLogLog and Count-Min.

Both are the constant-size summaries a 100-TB pipeline reaches for when
the exact answer (count DISTINCT, per-token frequency) would shuffle
every token: per-batch partials are a fixed few-KB table regardless of
input size, merge is an elementwise max (HLL) or sum (CM), and the
final answer is computed from the merged registers alone.

Hashes derive from md5 hex prefixes so the DuckDB oracle twins rebuild
them bit-exactly (same pattern as the DSIR bucket hash,
pipelines/queries.py: q_dsir_weights).

References: Flajolet, Fusy, Gandouet, Meunier, "HyperLogLog: the
analysis of a near-optimal cardinality estimation algorithm" (AofA
2007); Cormode & Muthukrishnan, "An improved data stream summary: the
count-min sketch and its applications" (J. Algorithms 2005).
"""

from __future__ import annotations

import hashlib

import numpy as np

# HyperLogLog geometry: p=10 -> m=1024 registers, ~3.25% relative error.
HLL_P = 10
HLL_M = 1 << HLL_P
# 60-bit hash (15 md5 hex chars; fits signed int64 and DuckDB BIGINT).
_HLL_HASH_BITS = 60
_HLL_W_BITS = _HLL_HASH_BITS - HLL_P  # 50 value bits feed the rank

# Count-Min geometry: d=4 rows x w=2048 buckets -> eps ~ e/2048 of the
# stream length, delta ~ e^-4.
CM_D = 4
CM_W = 2048


def _dedup(items: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(unique values, inverse index) over the items — tokens repeat
    heavily in natural-language streams, so every md5 below runs once
    per DISTINCT item (the simhash_batch trick; measured ~6x on Zipfian
    token streams vs hashing every occurrence).  pd.factorize is the
    hash-based O(n) dedup — np.unique's object-string mergesort was the
    bottleneck at high repeat factors."""
    import pandas as pd

    arr = np.asarray([i or "" for i in items], dtype=object)
    inv, uniq = pd.factorize(arr)
    return np.asarray(uniq, dtype=object), inv


def _md5_prefix_int(uniq: np.ndarray, prefix: bytes, nbytes: int, shift: int) -> np.ndarray:
    """int64 of the top ``nbytes`` md5 bytes (>> shift) per unique item
    — byte-for-byte equal to int('0x' + hexdigest[:2*nbytes - shift//4])
    without building hex strings."""
    md5 = hashlib.md5
    return np.fromiter(
        (
            int.from_bytes(md5(prefix + u.encode("utf-8")).digest()[:nbytes], "big") >> shift
            for u in uniq
        ),
        dtype=np.int64,
        count=len(uniq),
    )


def hash60(items: list[str]) -> np.ndarray:
    """60-bit nonneg int64 hash per item (md5 hex prefix, the SQL-twin
    formula: CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)); md5 runs
    once per distinct item."""
    if not len(items):
        return np.array([], dtype=np.int64)
    uniq, inv = _dedup(items)
    # digest[:8] >> 4 == int(hexdigest[:15], 16), verified in tests
    return _md5_prefix_int(uniq, b"", 8, 4)[inv]


def hll_bucket_rho(hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Split 60-bit hashes into (bucket, rho): bucket = low p bits' modulo,
    rho = 1 + number of leading zeros of the remaining 50-bit word
    (all-zero word -> rho = 51).  np.frexp's exponent IS bit_length for
    positive ints < 2^53, exactly."""
    bucket = hashes % HLL_M
    w = hashes >> HLL_P
    bl = np.frexp(w.astype(np.float64))[1]  # 0 for w == 0
    rho = (_HLL_W_BITS + 1 - bl).astype(np.int64)
    return bucket.astype(np.int64), rho


def hll_estimate(buckets: np.ndarray, rhos: np.ndarray) -> float:
    """Cardinality estimate from a merged register set (only observed
    buckets need appear; absent buckets are zero).  Standard HLL with
    the linear-counting small-range correction."""
    reg = np.zeros(HLL_M, dtype=np.int64)
    if len(buckets):
        np.maximum.at(reg, np.asarray(buckets, np.int64), np.asarray(rhos, np.int64))
    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int(np.sum(reg == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def cm_buckets(tokens: list[str]) -> np.ndarray:
    """(d, n) bucket matrix: row r uses md5(f"{r}:{token}") so each of
    the d hash functions is independent and SQL-reconstructible; md5
    runs d times per DISTINCT token, not per occurrence."""
    out = np.empty((CM_D, len(tokens)), dtype=np.int64)
    if not len(tokens):
        return out
    uniq, inv = _dedup(tokens)
    for r in range(CM_D):
        # digest[:4] == int(hexdigest[:8], 16)
        out[r] = _md5_prefix_int(uniq, f"{r}:".encode(), 4, 0)[inv] % CM_W
    return out


def cm_estimate(sketch: np.ndarray, tokens: list[str]) -> np.ndarray:
    """Point-query the merged (d, w) counter matrix: min over rows of the
    counter each hash lands on.  Never underestimates the true count."""
    if not len(tokens):
        return np.array([], dtype=np.int64)
    b = cm_buckets(tokens)
    return np.min(sketch[np.arange(CM_D)[:, None], b], axis=0).astype(np.int64)


BLOOM_D = 3
BLOOM_M = 1 << 11  # bits — deliberately tight so the false-positive
#   path is exercised at test scale; size m ~ 10n/ln2 in production
BLOOM_WORD = 32  # bits per word (int64 values stay < 2^32: SQL-safe)
BLOOM_WORDS = BLOOM_M // BLOOM_WORD


def bloom_positions(keys: list[str]) -> np.ndarray:
    """(d, n) bit-position matrix: row r uses md5(f"b{r}:{key}") % M so
    each hash function is independent and SQL-reconstructible (same
    15-hex-digit prefix trick as hash60); md5 runs once per distinct
    key per row."""
    out = np.empty((BLOOM_D, len(keys)), dtype=np.int64)
    if not len(keys):
        return out
    uniq, inv = _dedup(keys)
    for r in range(BLOOM_D):
        out[r] = _md5_prefix_int(uniq, f"b{r}:".encode(), 8, 4)[inv] % BLOOM_M
    return out


def bloom_partial(keys: list[str]) -> np.ndarray:
    """One batch's bitmap contribution: a dense (BLOOM_WORDS,) int64
    word vector (32 used bits per word).  Merge partials with
    np.bitwise_or — the sketch is order-insensitive and mergeable."""
    words = np.zeros(BLOOM_WORDS, dtype=np.int64)
    if len(keys):
        pos = bloom_positions(keys).ravel()
        np.bitwise_or.at(words, pos // BLOOM_WORD, np.int64(1) << (pos % BLOOM_WORD))
    return words


def bloom_probe(words: np.ndarray, keys: list[str]) -> np.ndarray:
    """Membership test per key against a merged word vector: True iff
    all d bits are set.  No false negatives by construction."""
    if not len(keys):
        return np.array([], dtype=bool)
    pos = bloom_positions(keys)
    hit = (words[pos // BLOOM_WORD] >> (pos % BLOOM_WORD)) & 1
    return hit.all(axis=0)
