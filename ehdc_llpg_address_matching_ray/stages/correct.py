"""ST1 — SymSpell token-correction stage (actor pool holding the
broadcast symmetric-delete index).

Reference analogue: ``InitGlobalCorrector`` + ``BuildFromLLPG``
(internal/symspell/corrector.go:36-59, dictionary.go:30-221) — a process
singleton built from the gazetteer corpus, consulted inside
CanonicalAddress (internal/normalize/address.go:167-178).  Here the
dictionary is fit on (a sample of) the corpus' own unique canonical
texts, built once on the driver, broadcast via ``ray.put``, and resolved
ONCE per actor in ``__init__`` — never re-shipped per batch.

Correction is applied to the canonical token stream; ``canonical``,
``text_hash`` and ``n_tokens`` are rebuilt so downstream exact-dedup and
blocking see the corrected text.  Skip rules (corrector.go:100-143):
short tokens, house-number-shaped tokens, street suffixes — plus an
engine-level guard skipping ANY digit-bearing token (postcode-like codes
must never be "corrected" into a neighbouring code; divergence noted).
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

import ray
import ray.data as rd

from ..config import SymSpellConfig
from ..functions import symspell as SS
from ..functions import textstats as TS

# token-column sentinel carrying each block's distinct-doc count in the
# distributed df fit (no canonical token can contain a NUL byte)
_DOCS_SENTINEL = "\x00docs\x00"


def fit_token_df(
    normalized_ds: rd.Dataset,
    sample_fraction: float = 1.0,
    max_vocab: int = 200_000,
    seed: int = 42,
    auto_sample_docs: int = 2_000_000,
    distributed_threshold: int = 100_000,
) -> tuple[Counter, int]:
    """One driver pass over (a sample of) the normalized canonical texts,
    deduplicated by text_hash: token document frequencies + doc count.

    This single pass feeds BOTH the SymSpell dictionary (ST1) and the
    idf vector (P1's TF-IDF cosine) so the corpus is scanned once.

    The driver pass is BOUNDED: above ``auto_sample_docs`` rows the
    corpus is sampled down to ~that many docs before streaming, so
    driver time/memory never scales with the corpus (document frequencies
    are a distributional statistic — a 2M-doc sample pins them; the vocab
    is further capped at ``max_vocab``).

    DETERMINISM: the fit is a pure function of corpus CONTENT, never of
    physical block layout — required for the resume contract (a resumed
    run and a fresh run must build the identical fact).  Sampling keeps
    a row iff its text_hash's top-64-bit value falls under the fraction
    threshold (content-keyed Bernoulli: duplicates sample together,
    block boundaries irrelevant; ``seed`` folds into the threshold key),
    and the distributed partial fit co-locates rows by text_hash first
    so the per-partition dedup IS global dedup (the exchange is bounded
    by the sample cap, so it never scales with the corpus).
    """
    ds = normalized_ds.select_columns(["canonical", "text_hash"])
    n_rows = None
    if sample_fraction >= 1.0:
        try:
            n_rows = normalized_ds.count()
        except Exception:
            n_rows = None
        if n_rows and n_rows > auto_sample_docs:
            sample_fraction = auto_sample_docs / n_rows
    if sample_fraction < 1.0:
        thresh = min(int(sample_fraction * float(1 << 64)), (1 << 64) - 1)
        salt = (seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF

        def _content_sample(b: pa.Table) -> pa.Table:
            keys = [
                (int((h or "0" * 16)[:16], 16) ^ salt) < thresh
                for h in b["text_hash"].to_pylist()
            ]
            return b.filter(pa.array(keys, pa.bool_()))

        ds = ds.map_batches(_content_sample, batch_format="pyarrow")

    df: Counter = Counter()
    n_docs = 0
    if n_rows is not None and n_rows > distributed_threshold:
        # Distributed partial fit: rows are co-partitioned by text_hash
        # (every duplicate of a text lands in ONE partition), each
        # partition counts its token dfs over globally-distinct texts
        # and emits a vocab-sized (token, df) table plus a doc-count
        # sentinel; the driver merges only these bounded partials —
        # O(vocab x partitions), never O(corpus).  The keyed exchange
        # moves at most the sample cap's rows, and makes the fit EXACT
        # and block-layout-independent (the old per-block dedup counted
        # a duplicate once per block it landed in — layout-dependent,
        # which broke the resumed-equals-clean fact contract).
        def _block_df(b: pa.Table) -> pa.Table:
            texts = b["canonical"].to_pylist()
            hashes = b["text_hash"].to_pylist()
            seen: set[str] = set()
            bdf: Counter = Counter()
            n = 0
            for t, h in zip(texts, hashes):
                if h in seen:
                    continue
                seen.add(h)
                n += 1
                if t:
                    bdf.update(set(t.split(" ")))
            bdf.pop(_DOCS_SENTINEL, None)
            toks = list(bdf.keys())
            return pa.table(
                {
                    "token": pa.array(toks + [_DOCS_SENTINEL], pa.string()),
                    "df": pa.array([bdf[t] for t in toks] + [0], pa.int64()),
                    "docs": pa.array([0] * len(toks) + [n], pa.int64()),
                }
            )

        from ..rayutil import default_partitions, partition_by_key

        parted = partition_by_key(
            ds,
            ["text_hash"],
            default_partitions(min(n_rows, auto_sample_docs)),
            sort=False,
        )
        partials = parted.map_batches(_block_df, batch_format="pyarrow", batch_size=None)
        # merge the partials DISTRIBUTED (token-keyed exchange + per-
        # partition sum); the driver receives one row per distinct token
        # instead of vocab x partitions partial rows and does no groupby

        def _merge_cap(d):
            g = d.groupby("token", sort=False, as_index=False).agg(
                df=("df", "sum"), docs=("docs", "sum")
            )
            # the exchange is token-keyed (each token fully in ONE
            # partition), so the global top-max_vocab is exactly
            # contained in the union of per-partition top-max_vocab:
            # cap here and the driver never receives more than
            # partitions x max_vocab rows, however large the corpus
            # vocabulary grows (sentinel rows always kept)
            if len(g) > max_vocab:
                sent = g[g["token"] == _DOCS_SENTINEL]
                g = g.nlargest(max_vocab, "df")
                if not sent.empty and _DOCS_SENTINEL not in set(g["token"]):
                    import pandas as _pd

                    g = _pd.concat([g, sent], ignore_index=True)
            return g

        merged = partition_by_key(partials, ["token"], 8, sort=False).map_batches(
            _merge_cap,
            batch_format="pandas",
            batch_size=None,
        )
        pdf = merged.to_pandas()
        is_sent = pdf["token"] == _DOCS_SENTINEL
        n_docs = int(pdf.loc[is_sent, "docs"].sum())
        rest = pdf[~is_sent]
        df = Counter(dict(zip(rest["token"], rest["df"].astype(int))))
    else:
        seen_all: set[str] = set()
        for batch in ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
            texts = batch["canonical"].to_pylist()
            hashes = batch["text_hash"].to_pylist()
            for t, h in zip(texts, hashes):
                if h in seen_all:
                    continue
                seen_all.add(h)
                n_docs += 1
                if t:
                    df.update(set(t.split(" ")))
    if len(df) > max_vocab:
        df = Counter(dict(df.most_common(max_vocab)))
    return df, max(1, n_docs)


def build_symspell(token_df: Counter, cfg: SymSpellConfig) -> SS.SymSpell:
    """Dictionary from doc frequencies, rare tokens (< min_frequency)
    excluded — typos stay out so unknown tokens correct toward their
    frequent neighbours (BuildFromLLPG's MinFrequency semantics)."""
    freqs = {t: f for t, f in token_df.items() if f >= cfg.min_frequency}
    if len(freqs) > cfg.max_vocab:
        freqs = dict(Counter(freqs).most_common(cfg.max_vocab))
    return SS.build_from_corpus_tokens(
        freqs,
        max_edit_distance=cfg.max_edit_distance,
        min_term_length=cfg.min_term_length,
        min_frequency=1,  # already filtered above
    )


class SymSpellStage:
    """map_batches actor: rewrite canonical with corrected tokens.

    ``sym`` may be a ray.ObjectRef (broadcast) or a SymSpell instance.
    Only tokens ABSENT from the dictionary are corrected (conservative:
    a known spelling is never rewritten, matching lookup()'s distance-0
    short-circuit), and digit-bearing tokens are always left alone.
    """

    def __init__(self, sym, cfg: SymSpellConfig | None = None):
        if isinstance(sym, ray.ObjectRef):
            sym = ray.get(sym)
        self.corrector = SS.Corrector(
            sym,
            max_edit_distance=(cfg or SymSpellConfig()).max_edit_distance,
            min_term_length=(cfg or SymSpellConfig()).min_term_length,
        )
        self._cache: dict[str, str] = {}

    def _fix_token(self, tok: str) -> str:
        if any(c.isdigit() for c in tok):
            return tok
        hit = self._cache.get(tok)
        if hit is not None:
            return hit
        fixed, _dist = self.corrector.correct_token(tok)
        if len(self._cache) < 200_000:
            self._cache[tok] = fixed
        return fixed

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["canonical"].to_pylist()
        out = []
        for t in texts:
            if not t:
                out.append(t)
                continue
            out.append(" ".join(self._fix_token(tok) for tok in t.split(" ")))
        canonical = pa.array(out, pa.string())
        text_hash = pa.array(TS.md5_hex(out), pa.string())
        n_tokens = TS.whitespace_token_count(canonical).cast(pa.int32())
        cols = {name: batch[name] for name in batch.column_names}
        cols["canonical"] = canonical
        cols["text_hash"] = text_hash
        cols["n_tokens"] = n_tokens
        return pa.table(cols)


def apply_symspell(
    normalized_ds: rd.Dataset,
    sym_ref,
    cfg: SymSpellConfig,
    concurrency=(1, 8),
    batch_size: int = 4096,
) -> rd.Dataset:
    """normalized -> corrected-normalized (same schema, canonical
    rewritten).  Task-based: the broadcast dictionary ref resolves from
    the local object store once per warm worker (rayutil.worker_cached)
    instead of once per freshly-spawned pool actor."""
    from ..rayutil import ref_token, worker_cached

    _tok = ref_token(sym_ref, cfg)

    def _correct(batch: pa.Table) -> pa.Table:
        stage = worker_cached("symspell", _tok, lambda: SymSpellStage(sym_ref, cfg))
        return stage(batch)

    return normalized_ds.map_batches(
        _correct, batch_format="pyarrow", batch_size=batch_size
    )
