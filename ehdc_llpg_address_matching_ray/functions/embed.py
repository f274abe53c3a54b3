"""Hash-based pseudo-embedder — vectorized port of SimpleEmbedder.

Reference: /root/reference internal/embeddings/simple.go:21-98.
Deterministic MD5-seeded 384-dim unit vectors + handcrafted features.
Float32 arithmetic like the Go original; the vector norm uses numpy's
pairwise summation (vs Go's sequential accumulation) — a sub-ULP-scale
divergence documented in SURVEY.md §2.9; our scalar and batch paths share
the numpy definition so they agree exactly.

The batch path (``embed_batch``) is the hot kernel used inside the
scoring actor pool: one call embeds a whole Arrow column with numpy ops;
only the md5 digests are computed per-row (hashlib, ~1 µs each).
"""

from __future__ import annotations

import hashlib

import numpy as np

DEFAULT_DIMS = 384

_ADDRESS_TERMS = ("ROAD", "STREET", "AVENUE", "LANE", "CLOSE", "DRIVE", "GARDENS", "COURT")


def embed_batch(texts: list[str], dims: int = DEFAULT_DIMS) -> np.ndarray:
    """Embed a list of texts -> (n, dims) float32 unit matrix.

    Port of SimpleEmbedder.Embed (simple.go:21-98): text uppercased and
    trimmed, md5 bytes tiled into [-1,1], last 4 dims overwritten with
    token-count / length / address-term / numeric-token features, then
    L2-normalized.  Empty text -> zero vector.
    """
    n = len(texts)
    out = np.zeros((n, dims), dtype=np.float32)
    if n == 0:
        return out

    digests = np.zeros((n, 16), dtype=np.uint8)
    nonempty = np.zeros(n, dtype=bool)
    tok_counts = np.zeros(n, dtype=np.float32)
    text_lens = np.zeros(n, dtype=np.float32)
    term_counts = np.zeros(n, dtype=np.float32)
    num_fracs = np.zeros(n, dtype=np.float32)

    for i, raw in enumerate(texts):
        if raw is None or raw == "":
            continue
        t = raw.strip().upper()
        nonempty[i] = True
        digests[i] = np.frombuffer(hashlib.md5(t.encode("utf-8")).digest(), dtype=np.uint8)
        tokens = t.split()
        if tokens:
            tok_counts[i] = len(tokens)
            text_lens[i] = len(t.encode("utf-8"))  # Go len(text) is bytes
            term_counts[i] = sum(1 for term in _ADDRESS_TERMS if term in t)
            numeric = sum(1 for tok in tokens if any("0" <= c <= "9" for c in tok))
            num_fracs[i] = numeric / len(tokens)

    # hash bytes tiled across dims: vector[i] = hash[i % 16]/255*2-1
    idx = np.arange(dims) % 16
    tiled = digests[:, idx].astype(np.float32)
    out[nonempty] = (tiled[nonempty] / np.float32(255.0)) * np.float32(2.0) - np.float32(1.0)

    has_tokens = nonempty & (tok_counts > 0)
    if dims > 10:
        out[has_tokens, dims - 1] = tok_counts[has_tokens] / np.float32(20.0)
    if dims > 11:
        out[has_tokens, dims - 2] = text_lens[has_tokens] / np.float32(100.0)
    if dims > 12:
        out[has_tokens, dims - 3] = term_counts[has_tokens] / np.float32(len(_ADDRESS_TERMS))
    if dims > 13:
        out[has_tokens, dims - 4] = num_fracs[has_tokens]

    norms = np.sqrt((out * out).sum(axis=1, dtype=np.float32))
    nz = norms > 0
    out[nz] /= norms[nz, None]
    return out


def embed(text: str, dims: int = DEFAULT_DIMS) -> np.ndarray:
    """Single-text convenience wrapper (same code path as the batch)."""
    return embed_batch([text], dims)[0]


def cosine_similarity(v1: np.ndarray, v2: np.ndarray) -> float:
    """Port of CosineSimilarity (features.go:471-489): float32 products
    accumulated in float64."""
    if v1.shape != v2.shape:
        return 0.0
    dot = float(np.dot(v1.astype(np.float64), v2.astype(np.float64)))
    n1 = float(np.dot(v1.astype(np.float64), v1.astype(np.float64)))
    n2 = float(np.dot(v2.astype(np.float64), v2.astype(np.float64)))
    if n1 == 0 or n2 == 0:
        return 0.0
    return dot / (n1 ** 0.5 * n2 ** 0.5)


def cosine_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Batched pairwise cosine: a (n,d) vs b (n,d) row-by-row -> (n,).
    Used by the scoring actor; float64 accumulation like the scalar."""
    a64 = a.astype(np.float64)
    b64 = b.astype(np.float64)
    dots = np.einsum("ij,ij->i", a64, b64)
    na = np.sqrt(np.einsum("ij,ij->i", a64, a64))
    nb = np.sqrt(np.einsum("ij,ij->i", b64, b64))
    denom = na * nb
    out = np.zeros(len(a64), dtype=np.float64)
    nz = denom > 0
    out[nz] = dots[nz] / denom[nz]
    return out
