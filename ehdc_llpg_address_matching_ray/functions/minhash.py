"""MinHash signatures + LSH band keys — the blocking structure.

This replaces the reference's pg_trgm GIN index blocking
(internal/match/generator.go:209-249, index DDL
ADDRESS_MATCHING_ALGORITHM.md:401-410) with MinHash-LSH band keys emitted
per row and shuffled with one ``groupby(block_key)`` — the north-rule
design.  Everything is vectorized numpy; no per-shingle hashlib calls.

Scheme:
- shingles: char 3-grams (default) packed into uint64 by byte values, or
  token 3-grams folded from crc32 token hashes.
- signature: num_perm universal hashes h_j(x) = (a_j*x + b_j) mod p over
  the shingle set, minimized (p = 2^61-1; operands sized so products fit
  in uint64).
- band keys: FNV-style fold of each band's signature rows, salted with
  the band index so keys never collide across bands.

Rows with identical band keys land in the same block; Jaccard-similar
texts share at least one band key with probability 1-(1-s^r)^b.
"""

from __future__ import annotations

import zlib

import numpy as np

_P = np.uint64((1 << 61) - 1)  # Mersenne prime 2^61-1
_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def make_perms(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Seeded universal-hash parameters (a odd in [1, 2^39), b in [0, p))."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 39, size=num_perm).astype(np.uint64) | np.uint64(1)
    b = rng.randint(0, 1 << 61, size=num_perm).astype(np.uint64)
    return a, b


def char_shingles(text: str, k: int = 3) -> np.ndarray:
    """Distinct char k-gram codes of a UTF-8 string, as uint64.

    Each k-gram is the big-endian packing of its k bytes (k ≤ 8), so
    codes are < 2^(8k) and the universal hash stays overflow-safe for
    k ≤ 3 with 39-bit multipliers... for larger k we fold mod p first.
    """
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(b) < k:
        if len(b) == 0:
            return np.empty(0, dtype=np.uint64)
        # pad short strings so they still emit one shingle
        b = np.pad(b, (0, k - len(b)))
    windows = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    shifts = (np.arange(k - 1, -1, -1, dtype=np.uint64)) * np.uint64(8)
    codes = (windows << shifts).sum(axis=1, dtype=np.uint64)
    return np.unique(codes)


def token_shingles(tokens: list[str], k: int = 3) -> np.ndarray:
    """Distinct token k-gram codes folded from crc32 token hashes."""
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    h = np.array([zlib.crc32(t.encode("utf-8")) for t in tokens], dtype=np.uint64)
    if len(h) < k:
        h = np.pad(h, (0, k - len(h)), constant_values=np.uint64(0x9E3779B9))
    windows = np.lib.stride_tricks.sliding_window_view(h, k)
    acc = np.full(len(windows), _FNV_OFFSET, dtype=np.uint64)
    for j in range(k):
        acc = (acc ^ windows[:, j]) * _FNV_PRIME
    return np.unique(acc)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer: full-avalanche 64-bit mix (public constant
    set, Steele et al. 2014).  uint64 wraparound is the intended mod-2^64
    arithmetic."""
    x = np.asarray(x, dtype=np.uint64).copy()
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def minhash_signature(shingle_codes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(num_perm,) uint64 signature; empty shingle set -> all p (sentinel).

    Codes are avalanche-mixed BEFORE the linear universal hash: raw char
    shingles are packed ASCII (< 2^24, heavily structured), and
    (a*x + b) mod p over a small structured domain is piecewise linear
    with only ~a*2^24/p wrap points — which breaks min-wise independence
    (measured: sig agreement 0.30 for true J 0.92).  Mixing first spreads
    codes uniformly over [0, 2^64) and restores the standard MinHash
    estimator (agreement ≈ J up to fold collisions).
    """
    if len(shingle_codes) == 0:
        return np.full(len(a), _P, dtype=np.uint64)
    # mix, then fold below 2^24 so a*x fits in uint64 (a < 2^40, x < 2^24)
    x = (_mix64(shingle_codes) % np.uint64((1 << 24) - 59))[None, :]  # (1, n)
    hashed = (a[:, None] * x + b[:, None]) % _P                       # (num_perm, n)
    return hashed.min(axis=1)


def band_keys(sig: np.ndarray, num_bands: int) -> np.ndarray:
    """(num_bands,) uint64 block keys: FNV fold of each band, salted by
    the band index."""
    rows = len(sig) // num_bands
    bands = sig[: num_bands * rows].reshape(num_bands, rows)
    acc = _FNV_OFFSET + np.arange(1, num_bands + 1, dtype=np.uint64)
    for j in range(rows):
        acc = (acc ^ bands[:, j]) * _FNV_PRIME
    # reserve top bit as "lsh" namespace so exact-hash keys never collide
    return acc >> np.uint64(1)


def batch_band_keys(
    texts: list[str],
    a: np.ndarray,
    b: np.ndarray,
    num_bands: int,
    shingle_size: int = 3,
    token_lists: list[list[str]] | None = None,
) -> np.ndarray:
    """(n_rows, num_bands) uint64 band-key matrix for a batch of texts.

    If ``token_lists`` is given, shingles are token n-grams; else char
    n-grams of the text.
    """
    n = len(texts)
    out = np.empty((n, num_bands), dtype=np.uint64)
    for i in range(n):
        if token_lists is not None:
            codes = token_shingles(token_lists[i], shingle_size)
        else:
            codes = char_shingles(texts[i] or "", shingle_size)
        sig = minhash_signature(codes, a, b)
        out[i] = band_keys(sig, num_bands)
    return out


_BBK_CHUNK = 256  # texts per internal chunk: keeps the (num_perm, S)
# hash matrix cache-resident (~0.5 MB at 32 perms x ~60 shingles/text);
# 1024+ spills it and runs ~10x slower (measured)


def batch_signatures_char(
    texts: list[str], a: np.ndarray, b: np.ndarray, k: int = 3
) -> np.ndarray:
    """(n_rows, num_perm) uint64 MinHash signature matrix over char
    k-shingles, fully vectorized: ONE concatenated byte buffer for the
    whole batch, window codes gathered with k shifted index vectors, one
    (num_perm, total_shingles) universal-hash matrix, and per-text
    signature minima via ``np.minimum.reduceat`` — no per-text Python.
    Value-identical to char_shingles→minhash_signature per text
    (parity-tested).  Duplicate shingles are NOT deduped: a duplicate
    cannot change a minimum, so ``np.unique`` per text is pure overhead.
    """
    n = len(texts)
    num_perm = len(a)
    if n == 0:
        return np.empty((0, num_perm), dtype=np.uint64)
    if n > _BBK_CHUNK:
        out = np.empty((n, num_perm), dtype=np.uint64)
        for i in range(0, n, _BBK_CHUNK):
            out[i : i + _BBK_CHUNK] = batch_signatures_char(texts[i : i + _BBK_CHUNK], a, b, k)
        return out
    # pad 1..k-1-byte texts to k with NULs (char_shingles semantics:
    # short-but-nonempty texts emit exactly one padded shingle)
    encoded = []
    for t in texts:
        bs = (t or "").encode("utf-8")
        if 0 < len(bs) < k:
            bs = bs + b"\x00" * (k - len(bs))
        encoded.append(bs)
    plens = np.fromiter((len(e) for e in encoded), dtype=np.int64, count=n)
    n_sh = np.maximum(plens - (k - 1), 0)  # shingles per text (0 for empty)
    total = int(n_sh.sum())

    # signatures default to the empty-set sentinel (all p)
    sig = np.full((n, num_perm), _P, dtype=np.uint64)
    if total:
        flat = np.frombuffer(b"".join(encoded), dtype=np.uint8).astype(np.uint64)
        offs = np.concatenate(([0], np.cumsum(plens)[:-1]))
        live = n_sh > 0
        # global window-start indices: per live text, n_sh consecutive
        # positions beginning at its buffer offset
        starts = (
            np.arange(total)
            - np.repeat(np.concatenate(([0], np.cumsum(n_sh[live])[:-1])), n_sh[live])
            + np.repeat(offs[live], n_sh[live])
        )
        codes = np.zeros(total, dtype=np.uint64)
        for j in range(k):
            codes = (codes << np.uint64(8)) | flat[starts + j]
        x = _mix64(codes) % np.uint64((1 << 24) - 59)
        hashed = (a[:, None] * x[None, :] + b[:, None]) % _P  # (num_perm, total)
        seg = np.concatenate(([0], np.cumsum(n_sh[live])[:-1]))
        sig[live] = np.minimum.reduceat(hashed, seg, axis=1).T
    return sig


def batch_band_keys_char(
    texts: list[str], a: np.ndarray, b: np.ndarray, num_bands: int, k: int = 3
) -> np.ndarray:
    """Fully vectorized char-shingle variant of :func:`batch_band_keys`
    (value-identical, parity-tested): :func:`batch_signatures_char` for
    the signature matrix, then one vectorized band fold.

    The scalar path loops char_shingles→signature→band_keys per text
    (~200 us/text of numpy call overhead on ~50-shingle web canonicals);
    at ~1M reps that loop was ~6 s of the flagship's pairs stage at 32
    CPUs.
    """
    n = len(texts)
    num_perm = len(a)
    out = np.empty((n, num_bands), dtype=np.uint64)
    if n == 0:
        return out
    sig = batch_signatures_char(texts, a, b, k)

    # band fold, vectorized over all rows (identical to band_keys)
    rows = num_perm // num_bands
    bands = sig[:, : num_bands * rows].reshape(n, num_bands, rows)
    acc = np.broadcast_to(
        _FNV_OFFSET + np.arange(1, num_bands + 1, dtype=np.uint64), (n, num_bands)
    ).copy()
    with np.errstate(over="ignore"):
        for j in range(rows):
            acc = (acc ^ bands[:, :, j]) * _FNV_PRIME
    out[:] = acc >> np.uint64(1)
    return out


def string_key(s: str) -> int:
    """Deterministic 63-bit FNV-1a key of a string, namespaced with a
    "PK:" prefix so composite prefix-token keys virtually never collide
    with LSH band keys (a collision would only merge two blocks — extra
    candidate pairs, never lost ones)."""
    acc = int(_FNV_OFFSET)
    for byte in b"PK:" + s.encode("utf-8"):
        acc = ((acc ^ byte) * int(_FNV_PRIME)) & 0xFFFFFFFFFFFFFFFF
    return acc >> 1


def jaccard_estimate(sig1: np.ndarray, sig2: np.ndarray) -> float:
    """MinHash Jaccard estimate (fraction of agreeing permutations)."""
    return float(np.mean(sig1 == sig2))


def batch_shingle_codes(texts: list[str], k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """(row_idx, codes) for every char k-shingle in the batch — the same
    one-buffer window gather as :func:`batch_signatures_char` (identical
    short-text NUL padding), without the hashing.  Codes are k-byte
    packs (< 2^(8k)); duplicates are NOT deduped."""
    n = len(texts)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    encoded = []
    for t in texts:
        bs = (t or "").encode("utf-8")
        if 0 < len(bs) < k:
            bs = bs + b"\x00" * (k - len(bs))
        encoded.append(bs)
    plens = np.fromiter((len(e) for e in encoded), dtype=np.int64, count=n)
    n_sh = np.maximum(plens - (k - 1), 0)
    total = int(n_sh.sum())
    if not total:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    flat = np.frombuffer(b"".join(encoded), dtype=np.uint8).astype(np.uint64)
    offs = np.concatenate(([0], np.cumsum(plens)[:-1]))
    live = n_sh > 0
    starts = (
        np.arange(total)
        - np.repeat(np.concatenate(([0], np.cumsum(n_sh[live])[:-1])), n_sh[live])
        + np.repeat(offs[live], n_sh[live])
    )
    codes = np.zeros(total, dtype=np.uint64)
    for j in range(k):
        codes = (codes << np.uint64(8)) | flat[starts + j]
    rows = np.repeat(np.arange(n, dtype=np.int64)[live], n_sh[live])
    return rows, codes


def pair_char_jaccard(
    a_texts: list[str], b_texts: list[str], k: int = 3
) -> np.ndarray:
    """Exact char k-shingle set Jaccard per (a_texts[i], b_texts[i])
    pair, fully vectorized: distinct (pair, code) keys per side, one
    sorted intersect, bincount sizes.  Pairs where both sides are empty
    score 0.0 (empties are exact-dup territory, not near-dup)."""
    n = len(a_texts)
    assert len(b_texts) == n
    if n == 0:
        return np.empty(0, np.float64)
    shift = np.int64(8 * k + 1)
    ra, ca = batch_shingle_codes(a_texts, k)
    rb, cb = batch_shingle_codes(b_texts, k)
    ua = np.unique((ra << shift) | ca.astype(np.int64))
    ub = np.unique((rb << shift) | cb.astype(np.int64))
    inter = np.intersect1d(ua, ub, assume_unique=True)
    n_a = np.bincount(ua >> shift, minlength=n)
    n_b = np.bincount(ub >> shift, minlength=n)
    n_i = np.bincount(inter >> shift, minlength=n) if len(inter) else np.zeros(n, np.int64)
    union = n_a + n_b - n_i
    return np.where(union > 0, n_i / np.maximum(union, 1), 0.0)
