"""G1 — SAFE group-consensus corrections (the precision-preserving gate
set).

Port of the reference's safe-group-consensus pass
(cmd/matcher-v2/main.go:801-870 candidate analysis, :886-1012 apply):
groups (``group_key`` = planning_app_base analogue) vote on a consensus
gazetteer id; a group's vote is only APPLIED when every safety gate
holds — this gate set is what kept the reference's precision at 99.1%:

  total_docs BETWEEN 2 AND 30
  matched_docs > 0 AND matched_docs < total_docs
  real_addresses >= 0.6 * total_docs
  planning_refs (non-real) <= 3
  address_variations (distinct first-20 chars of real addresses) <= 5
  consensus_votes >= 2
  consensus_votes >= 0.4 * matched_docs
  best consensus id NOT NULL

Members receive the consensus id at banded confidence
0.95 / 0.90 / 0.85 for votes >= 5 / >= 3 / else (main.go:966-970), and
only members that are real addresses AND (unmatched OR score < 0.5 OR
matched to a non-consensus id) are corrected (main.go:984-996).

Ray Data shape: one keyed repartition by group_key, all gate arithmetic
vectorized pandas inside the partition — no per-group Python in Ray's
map_groups path (see rayutil.py).  The tie among equal-vote ids is
broken by (votes DESC, max score DESC, id ASC); the reference's LIMIT 1
without a final key is nondeterministic, we pin id ASC (documented
divergence).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..functions import components as CP
from ..rayutil import hash_shuffle, partition_by_key


def _group_gate(df: pd.DataFrame) -> pd.DataFrame:
    """Per-partition: evaluate the gate set per group_key and emit
    corrections (src_id, corrected_id, group_key, confidence)."""
    out_src, out_cid, out_gk, out_conf = [], [], [], []
    if len(df) == 0:
        return pd.DataFrame(
            {
                "src_id": pd.Series([], dtype="object"),
                "corrected_id": pd.Series([], dtype="object"),
                "group_key": pd.Series([], dtype="object"),
                "confidence": pd.Series([], dtype="float64"),
            }
        )
    df = df.copy()
    df["m_score"] = df["m_score"].fillna(0.0)
    df["matched_id"] = df["matched_id"].fillna("")
    df["is_real"] = [CP.is_real_address(t or "") for t in df["raw_address"]]

    for gk, g in df.groupby("group_key", sort=False):
        total = len(g)
        if not (2 <= total <= 30):
            continue
        matched = int((g["m_score"] > 0).sum())
        if matched == 0 or matched >= total:
            continue
        real = int(g["is_real"].sum())
        if real < total * 0.6:
            continue
        if (total - real) > 3:
            continue
        variations = g.loc[g["is_real"], "raw_address"].str[:20].nunique()
        if variations > 5:
            continue
        voters = g[(g["m_score"] > 0.5) & (g["matched_id"] != "")]
        if len(voters) == 0:
            continue
        tally = (
            voters.groupby("matched_id")
            .agg(votes=("matched_id", "size"), best=("m_score", "max"))
            .reset_index()
            .sort_values(
                ["votes", "best", "matched_id"],
                ascending=[False, False, True],
                kind="mergesort",
            )
        )
        best_id = tally.iloc[0]["matched_id"]
        votes = int(tally.iloc[0]["votes"])
        if votes < 2 or votes < matched * 0.4:
            continue
        conf = 0.95 if votes >= 5 else (0.90 if votes >= 3 else 0.85)
        fix = g[
            g["is_real"]
            & ((g["m_score"] < 0.5) | (g["matched_id"] == "") | (g["matched_id"] != best_id))
        ]
        for sid in fix["src_id"]:
            out_src.append(sid)
            out_cid.append(best_id)
            out_gk.append(gk)
            out_conf.append(conf)

    return pd.DataFrame(
        {
            "src_id": pd.Series(out_src, dtype="object"),
            "corrected_id": pd.Series(out_cid, dtype="object"),
            "group_key": pd.Series(out_gk, dtype="object"),
            "confidence": pd.Series(out_conf, dtype="float64"),
        }
    )


def group_consensus_corrections(
    sources_ds: rd.Dataset,
    matches_ds: rd.Dataset,
    source_id: str = "src_id",
    source_text: str = "raw_address",
    group_col: str = "group_key",
    num_partitions: int = 8,
) -> rd.Dataset:
    """sources (id, text, group) × matches (src_id, matched_id, score) ->
    SAFE consensus corrections, apply-ready for
    ``corrections.apply_corrections``.

    One left_outer join + one keyed repartition by group_key; every gate
    is evaluated inside the partition.
    """
    with hash_shuffle():
        src = sources_ds.map_batches(
            lambda b: pa.table(
                {
                    "src_id": b[source_id].cast(pa.string()),
                    "raw_address": b[source_text],
                    "group_key": b[group_col].cast(pa.string()),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        m = matches_ds.map_batches(
            lambda b: pa.table(
                {
                    "m_src": b["src_id"],
                    "matched_id": b["matched_id"],
                    "m_score": b["score"],
                }
            ),
            batch_format="pyarrow",
        )
        j = src.join(
            m, join_type="left_outer", num_partitions=num_partitions,
            on=("src_id",), right_on=("m_src",),
        )
        return partition_by_key(j, ["group_key"], num_partitions, sort=False).map_batches(
            _group_gate, batch_format="pandas", batch_size=None
        )
