"""Text analysis kernels: language-ID, quality scoring, token counting,
document fingerprinting.

Training-data-pipeline operators beyond the reference's inventory (the
task brief's extension list); all vectorized Arrow/numpy so they run as
stateless map_batches stages.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# Token counting
# ---------------------------------------------------------------------------

# BPE-ish word segmentation: letter runs, digit runs, single punctuation.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
_re_bpe = re.compile(BPE_TOKEN_PATTERN)


def whitespace_token_count(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Number of whitespace-separated tokens per row (vectorized)."""
    trimmed = pc.utf8_trim_whitespace(texts)
    toks = pc.split_pattern_regex(trimmed, r"\s+")
    counts = pc.list_value_length(toks)
    empty = pc.equal(trimmed, "")
    return pc.if_else(empty, pa.scalar(0, pa.int32()), counts)


def bpe_token_count(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Count of BPE-ish tokens per row (letter runs / digit runs / punct)."""
    return pc.count_substring_regex(texts, BPE_TOKEN_PATTERN)


# ---------------------------------------------------------------------------
# Quality scoring (length / punctuation / stopword ratios)
# ---------------------------------------------------------------------------

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it", "for", "on")


def quality_table(texts: pa.Array | pa.ChunkedArray) -> dict[str, pa.Array]:
    """Vectorized per-row quality metrics.

    Returns columns: n_chars, n_tokens, n_stopwords, punct_ratio,
    digit_ratio, quality_score (composite in [0,1]).
    """
    n_chars = pc.utf8_length(texts)
    n_tokens = whitespace_token_count(texts)
    sw_pattern = r"\b(?:" + "|".join(STOPWORDS) + r")\b"
    n_stop = pc.count_substring_regex(texts, sw_pattern)
    n_punct = pc.count_substring_regex(texts, r"[^\w\s]")
    n_digit = pc.count_substring_regex(texts, r"[0-9]")

    nc = pc.max_element_wise(n_chars.cast(pa.float64()), 1.0)
    punct_ratio = pc.divide(n_punct.cast(pa.float64()), nc)
    digit_ratio = pc.divide(n_digit.cast(pa.float64()), nc)
    nt = pc.max_element_wise(n_tokens.cast(pa.float64()), 1.0)
    stop_ratio = pc.divide(n_stop.cast(pa.float64()), nt)

    # Composite: length in a healthy band, some stopwords, low punct noise
    len_ok = pc.and_(pc.greater_equal(n_chars, 20), pc.less_equal(n_chars, 20000))
    score = pc.add(
        pc.add(
            pc.if_else(len_ok, 0.4, 0.0),
            pc.multiply(pc.min_element_wise(stop_ratio, 0.4), 1.0),
        ),
        pc.multiply(pc.max_element_wise(pc.subtract(0.2, punct_ratio), 0.0), 1.0),
    )
    return {
        "n_chars": n_chars.cast(pa.int64()),
        "n_tokens": n_tokens.cast(pa.int64()),
        "n_stopwords": n_stop.cast(pa.int64()),
        "punct_ratio": punct_ratio,
        "digit_ratio": digit_ratio,
        "quality_score": pc.min_element_wise(score, 1.0),
    }


# ---------------------------------------------------------------------------
# Language ID (n-gram / stopword heuristic)
# ---------------------------------------------------------------------------

_LANG_MARKERS: dict[str, frozenset[str]] = {
    "en": frozenset({"the", "and", "of", "to", "is", "in", "that", "it", "for", "was"}),
    "de": frozenset({"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "sich", "auf"}),
    "fr": frozenset({"le", "la", "les", "et", "est", "une", "des", "du", "que", "pour"}),
    "es": frozenset({"el", "los", "las", "es", "una", "por", "con", "para", "del", "como"}),
}


def detect_language(text: str) -> str:
    """Deterministic heuristic language-ID: CJK char ratio for zh, else
    stopword hit-rate argmax (ties broken by fixed language order)."""
    if not text:
        return "und"
    n = len(text)
    cjk = sum(1 for ch in text if "一" <= ch <= "鿿")
    if cjk / n > 0.2:
        return "zh"
    tokens = [t.lower() for t in re.findall(r"[A-Za-zÀ-ÿ]+", text)]
    if not tokens:
        return "und"
    best_lang, best_hits = "und", 0
    for lang in ("en", "de", "fr", "es"):
        hits = sum(1 for t in tokens if t in _LANG_MARKERS[lang])
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang if best_hits > 0 else "und"


# ---------------------------------------------------------------------------
# Fingerprints
# ---------------------------------------------------------------------------

def md5_hex(texts: list[str]) -> list[str]:
    """MD5 hex digest per text (the reference's address-hash fact key:
    MD5(LOWER(TRIM(raw))) at cmd/matcher-v2/main.go:1203 — we expose the
    plain digest; callers lower/trim upstream as needed)."""
    return [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]


def winnow_fingerprint(text: str, k: int = 5, window: int = 4) -> list[int]:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD 2003):
    min crc32 of char k-grams per sliding window, deduplicated, sorted."""
    if not text or len(text) < k:
        return []
    grams = [zlib.crc32(text[i : i + k].encode("utf-8")) for i in range(len(text) - k + 1)]
    if len(grams) <= window:
        return sorted(set([min(grams)]))
    picks = set()
    for i in range(len(grams) - window + 1):
        picks.add(min(grams[i : i + window]))
    return sorted(picks)


# ---------------------------------------------------------------------------
# Flattened token codes + Gopher repetition signals
# ---------------------------------------------------------------------------


def flat_token_codes(
    texts: pa.ChunkedArray | pa.Array,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, pa.Array]:
    """Whitespace-tokenize a batch of strings WITHOUT a per-row Python
    loop: Arrow split → flatten → drop the empty tokens Arrow emits for
    leading/trailing whitespace (after which the token stream equals
    Python ``str.split()``) → dictionary-encode.  Returns
    ``(row_idx, codes, token_lens, dictionary)`` — int64 numpy except
    the Arrow token dictionary — with tokens of one row contiguous and
    in document order."""
    ls = pc.utf8_split_whitespace(texts)
    if isinstance(ls, pa.ChunkedArray):
        ls = ls.combine_chunks()
    counts = pc.list_value_length(ls).to_numpy(zero_copy_only=False).astype(np.int64)
    row_all = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    flat_all = pc.list_flatten(ls)
    lens_all = pc.utf8_length(flat_all).to_numpy(zero_copy_only=False).astype(np.int64)
    nonempty = lens_all > 0
    enc = pc.dictionary_encode(flat_all.filter(pa.array(nonempty)))
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return row_all[nonempty], codes, lens_all[nonempty], enc.dictionary


def gopher_signals(texts: pa.ChunkedArray | pa.Array) -> dict[str, np.ndarray]:
    """Gopher-style repetition / quality signals (Rae et al. 2021
    §A1.1) per row: token count, top-token fraction, duplicate-2-gram
    fraction, mean token length — one vectorized pass (flattened token
    codes + sorted-run reduceat, no per-row loop)."""
    nrows = len(texts)
    doc, codes, lens, _ = flat_token_codes(pc.fill_null(texts, ""))
    n_toks = np.bincount(doc, minlength=nrows).astype(np.int64)
    denom = np.maximum(n_toks, 1)
    mean_len = np.bincount(doc, weights=lens, minlength=nrows) / denom
    top = np.zeros(nrows, dtype=np.int64)
    dup2 = np.zeros(nrows, dtype=np.float64)
    if len(doc):
        vocab = int(codes.max()) + 1
        uk, ucnt = np.unique(doc * vocab + codes, return_counts=True)
        udoc = uk // vocab
        starts = np.flatnonzero(np.r_[True, udoc[1:] != udoc[:-1]])
        top[udoc[starts]] = np.maximum.reduceat(ucnt, starts)
        same = doc[:-1] == doc[1:]
        bg_doc = doc[:-1][same]
        if len(bg_doc):
            import pandas as _pd

            bg = _pd.factorize(codes[:-1][same] * vocab + codes[1:][same])[0]
            vb = int(bg.max()) + 1
            n_distinct = np.bincount(np.unique(bg_doc * vb + bg) // vb, minlength=nrows)
            n_bg = np.bincount(bg_doc, minlength=nrows)
            dup2 = np.where(n_bg > 0, 1.0 - n_distinct / np.maximum(n_bg, 1), 0.0)
    return {
        "n_tokens": n_toks,
        "top_tok_frac": top / denom,
        "dup_2gram_frac": dup2,
        "mean_tok_len": mean_len,
    }


# ---------------------------------------------------------------------------
# PII detection / redaction (RE2 — identical semantics in Arrow and DuckDB)
# ---------------------------------------------------------------------------

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+1-\d{3}-\d{4}"
PII_IP = r"\b(\d{1,3}\.)(\d{1,3}\.)(\d{1,3}\.)\d{1,3}\b"


def pii_scrub(texts: pa.ChunkedArray | pa.Array) -> dict[str, pa.Array]:
    """Count + redact emails, NANP phone stubs and IPv4 literals in one
    vectorized Arrow pass (RE2 kernels; no per-row loop)."""
    t = pc.fill_null(texts, "")
    red = pc.replace_substring_regex(t, PII_EMAIL, "<EMAIL>")
    red = pc.replace_substring_regex(red, PII_PHONE, "<PHONE>")
    red = pc.replace_substring_regex(red, PII_IP, "<IP>")
    return {
        "n_emails": pc.cast(pc.count_substring_regex(t, PII_EMAIL), pa.int64()),
        "n_phones": pc.cast(pc.count_substring_regex(t, PII_PHONE), pa.int64()),
        "n_ips": pc.cast(pc.count_substring_regex(t, PII_IP), pa.int64()),
        "redacted": red,
    }
