"""J3 — corrections override join.

Reference: the fact rebuild LEFT JOINs ``address_match_corrected`` and
COALESCEs corrected values over the original match
(cmd/matcher-v2/main.go:1097-1098, :1200-1215; upserts :984-1012).
Here: a corrections Dataset ``(src_id, corrected_id, corrected_by)``
left-joined over the match results; a corrected row wins with
decision='auto_accept', method='corrected', score 1.0 — post-hoc human
overrides outrank every automatic tier.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def apply_corrections(
    matches_ds: rd.Dataset,
    corrections_ds: rd.Dataset,
    num_partitions: int = 8,
) -> rd.Dataset:
    """matches (src_id, matched_id, score, decision, method) ⟕
    corrections (src_id, corrected_id[, corrected_by]) with COALESCE
    semantics."""
    corr = corrections_ds.map_batches(
        lambda b: pa.table(
            {
                "c_src_id": b["src_id"],
                "corrected_id": b["corrected_id"],
            }
        ),
        batch_format="pyarrow",
    )
    j = matches_ds.join(
        corr, join_type="left_outer", num_partitions=num_partitions,
        on=("src_id",), right_on=("c_src_id",),
    )

    def coalesce(b: pa.Table) -> pa.Table:
        has_corr = pc.is_valid(b["corrected_id"])
        return pa.table(
            {
                "src_id": b["src_id"],
                "matched_id": pc.coalesce(b["corrected_id"], b["matched_id"]),
                "score": pc.if_else(has_corr, pa.scalar(1.0, pa.float64()), b["score"]),
                "decision": pc.if_else(has_corr, "auto_accept", b["decision"]),
                "method": pc.if_else(has_corr, "corrected", b["method"]),
                "was_corrected": has_corr,
            }
        )

    return j.map_batches(coalesce, batch_format="pyarrow")
