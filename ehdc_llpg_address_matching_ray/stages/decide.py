"""Per-source top-k + decision stage (D1/D2).

Reference: ranking internal/match/scorer.go:42-49, decision
scorer.go:142-198 (0.92 high / 0.88 conditional / 0.80 review / 0.70
floor, margin 0.03).

Scored pairs are symmetric (url_a < url_b); each side acts as a
"source document" whose candidate list is its incident pairs — so we
flat_map every pair into two directed rows and resolve per source with a
``groupby(src).map_groups`` (hash-partition by source, no global sort:
SURVEY.md D1 mapping).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..config import MatchTiers
from ..functions import features as F


def to_directed(batch: pa.Table) -> pa.Table:
    """Each undirected scored pair -> two directed (src, cand) rows."""
    cols = ["score"]
    base = {
        "src": pa.concat_arrays([batch["url_a"].combine_chunks(), batch["url_b"].combine_chunks()]),
        "cand": pa.concat_arrays([batch["url_b"].combine_chunks(), batch["url_a"].combine_chunks()]),
    }
    for c in cols:
        arr = batch[c].combine_chunks()
        base[c] = pa.concat_arrays([arr, arr])
    return pa.table(base)


def decide_group(g: pd.DataFrame, tiers: MatchTiers, top_k: int = 10) -> pd.DataFrame:
    """Per-source decision: sort desc, top-k kept for audit, decision per
    the tier/margin logic.  The production path has no house/locality
    conditional inputs (those live in the fidelity scorer), so the 0.88
    medium tier's extra conditions evaluate False — matching the
    reference when those features are absent."""
    g = g.sort_values("score", ascending=False, kind="mergesort").head(top_k)
    cands = [
        F.ScoredCandidate(cand_id=row.cand, score=row.score)
        for row in g.itertuples(index=False)
    ]
    decision, accepted = F.make_decision(cands, tiers)
    top = cands[0]
    margin = 1.0 if len(cands) == 1 else top.score - cands[1].score
    return pd.DataFrame(
        {
            "url": [g["src"].iloc[0]],
            "decision": [decision],
            "accepted_url": [accepted],
            "top_score": [top.score],
            "margin": [margin],
            "n_candidates": [len(cands)],
        }
    )


def decide(scored_pairs_ds, tiers: MatchTiers | None = None, top_k: int = 10):
    """scored pairs -> per-source DECISIONS Dataset."""
    tiers = tiers or MatchTiers()
    directed = scored_pairs_ds.map_batches(to_directed, batch_format="pyarrow")
    return directed.groupby("src").map_groups(
        lambda g: decide_group(g, tiers, top_k), batch_format="pandas"
    )
