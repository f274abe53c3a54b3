"""Blocking: exact-dup grouping, LSH key emission, in-block pair
enumeration with salted skew caps.

Reference analogues:
- exact canonical block  J2 (internal/match/generator.go:174-206) and the
  dedup-then-fanout pattern G3 (cmd/matcher-v2/enhanced_layer3.go:50-97)
- trigram GIN blocking   J4 (internal/match/generator.go:209-249) →
  MinHash-LSH band keys here (north rule)
- group-size caps        cmd/matcher-v2/main.go:858 capped groups at 30;
  at web scale we SALT oversized blocks instead: contiguous chunks of a
  sorted block, each chunk pair-enumerated independently, with the
  dropped cross-chunk coverage logged (no silent truncation).

Dataflow (all Ray Data primitives):
    normalized ──groupby(text_hash).aggregate(min url)──► rep mapping
    reps ──map_batches(BandKeyEmitter)──flat_map──► (block_key, payload)
    ──groupby(block_key).map_groups(enumerate_pairs)──► candidate pairs
    ──groupby(url_a,url_b).aggregate(min payload)──► deduped pairs
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import BlockingConfig
from ..functions import minhash as MH
from ..functions import phonetics as PH


class BandKeyEmitter:
    """Stateful map_batches callable: holds the seeded permutation
    matrices (built once per actor, SURVEY.md §7.3) and emits one row per
    (row × band): columns (block_key, url, text, canonical).

    Output rows = input rows × num_bands, so downstream groupby shuffles
    only these narrow columns — html/raw text beyond what scoring needs
    never enters the exchange.
    """

    def __init__(self, cfg: BlockingConfig):
        self.cfg = cfg
        self.a, self.b = MH.make_perms(cfg.num_perm, cfg.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["canonical"].to_pylist()
        if self.cfg.char_shingles:
            keys = MH.batch_band_keys(
                texts, self.a, self.b, self.cfg.num_bands, self.cfg.shingle_size
            )
        else:
            token_lists = [t.split(" ") if t else [] for t in texts]
            keys = MH.batch_band_keys(
                texts, self.a, self.b, self.cfg.num_bands,
                self.cfg.shingle_size, token_lists=token_lists,
            )
        if self.cfg.use_prefix_key:
            # composite prefix-token keys (hierarchical-cascade analogue,
            # internal/engine/hierarchical_matcher.go:51-153): equality key
            # on the first K canonical tokens, plus a phonetic variant
            # (soundex-level of the cascade) where alpha tokens collapse to
            # metaphone codes — rescues short texts whose shingle Jaccard
            # falls below the LSH threshold and DL-1 street-token typos
            exact_pk = np.empty(len(texts), dtype=np.int64)
            phon_pk = np.empty(len(texts), dtype=np.int64)
            k = self.cfg.prefix_tokens
            for i, t in enumerate(texts):
                if not t:
                    exact_pk[i] = 0
                    phon_pk[i] = 0
                    continue
                toks = t.split(" ")[:k]
                exact_pk[i] = MH.string_key(" ".join(toks))
                phon_pk[i] = MH.string_key(
                    "PH|" + " ".join(tok if tok.isdigit() else PH.metaphone(tok) for tok in toks)
                )
            keys = np.concatenate(
                [keys.astype(np.int64), exact_pk[:, None], phon_pk[:, None]], axis=1
            )
        n, nb = keys.shape
        idx = np.repeat(np.arange(n), nb)
        out = pa.table(
            {
                "block_key": pa.array(keys.reshape(-1).astype("int64"), pa.int64()),
                "url": batch["url"].take(pa.array(idx)),
                "text": batch["text"].take(pa.array(idx)),
                "canonical": batch["canonical"].take(pa.array(idx)),
            }
        )
        return out


def enumerate_pairs(group: pd.DataFrame, cfg: BlockingConfig) -> pd.DataFrame:
    """groupby(block_key).map_groups fn: all pairs within the block,
    salted when oversized.

    Oversized blocks (> max_block_size rows) are sorted by url and split
    into contiguous chunks of max_block_size; pairs are enumerated within
    each chunk only.  The number of dropped cross-chunk pairs is recorded
    in the ``dropped_pairs`` column of the first emitted row so the
    pipeline can aggregate a coverage metric (no silent truncation).
    """
    n = len(group)
    if n < 2:
        return pd.DataFrame(
            columns=["url_a", "url_b", "text_a", "text_b", "canonical_a", "canonical_b", "dropped_pairs"]
        )
    g = group.sort_values("url", kind="mergesort").reset_index(drop=True)
    cap = cfg.max_block_size
    urls = g["url"].to_numpy()
    texts = g["text"].to_numpy()
    canons = g["canonical"].to_numpy()

    ia: list[int] = []
    ib: list[int] = []
    dropped = 0
    if n <= cap:
        iu, il = np.triu_indices(n, k=1)
        ia, ib = iu, il
    else:
        total_pairs = n * (n - 1) // 2
        kept = 0
        ia_l, ib_l = [], []
        for start in range(0, n, cap):
            m = min(cap, n - start)
            if m < 2:
                continue
            iu, il = np.triu_indices(m, k=1)
            ia_l.append(iu + start)
            ib_l.append(il + start)
            kept += m * (m - 1) // 2
        ia = np.concatenate(ia_l) if ia_l else np.array([], dtype=int)
        ib = np.concatenate(ib_l) if ib_l else np.array([], dtype=int)
        dropped = total_pairs - kept

    out = pd.DataFrame(
        {
            "url_a": urls[ia],
            "url_b": urls[ib],
            "text_a": texts[ia],
            "text_b": texts[ib],
            "canonical_a": canons[ia],
            "canonical_b": canons[ib],
        }
    )
    out["dropped_pairs"] = 0
    if dropped and len(out):
        out.iloc[0, out.columns.get_loc("dropped_pairs")] = dropped
    return out


def build_blocks(reps_ds, cfg: BlockingConfig, concurrency: int | None = None):
    """reps Dataset -> deduped candidate-pair Dataset.

    reps_ds columns: (url, text, canonical).  Returns PAIRS columns +
    dropped_pairs.
    """
    keyed = reps_ds.map_batches(
        BandKeyEmitter,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        concurrency=concurrency or (1, 8),
        batch_size=4096,
    )
    pairs = keyed.groupby("block_key").map_groups(
        lambda g: enumerate_pairs(g, cfg), batch_format="pandas"
    )
    # cross-band dedup: same pair found under several band keys; min() of
    # identical payloads is the payload (vectorized aggregate, no
    # per-group python) — E1 analogue (generator.go:388-419)
    from ray.data.aggregate import Max, Min

    deduped = pairs.groupby(["url_a", "url_b"]).aggregate(
        Min("text_a", alias_name="text_a"),
        Min("text_b", alias_name="text_b"),
        Min("canonical_a", alias_name="canonical_a"),
        Min("canonical_b", alias_name="canonical_b"),
        Max("dropped_pairs", alias_name="dropped_pairs"),
    )
    return deduped


def exact_groups(normalized_ds, num_partitions: int = 16):
    """groupby(text_hash) -> (membership, reps).

    membership: normalized columns + rep_url (the lexicographically
    smallest url sharing the canonical hash).  reps: the representative
    rows only — the G3 dedup-then-score-once pattern.
    """
    from ray.data.aggregate import Min

    rep_map = normalized_ds.groupby("text_hash").aggregate(Min("url", alias_name="rep_url"))
    membership = normalized_ds.join(
        rep_map,
        join_type="inner",
        num_partitions=num_partitions,
        on=("text_hash",),
    )
    reps = membership.filter(expr="url == rep_url")
    return membership, reps
