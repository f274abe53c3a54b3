"""Incremental re-match (queries.q_incremental_match): the carry-forward
+ delta-rematch composition must equal a full re-match of the new
snapshot, and the delta side must only touch changed sources."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq


def full_rematch_reference(sf_dir: str) -> pd.DataFrame:
    """Full re-match of the synthesized new snapshot, computed directly
    through run_match (no incremental machinery) — the invariant the
    incremental path must reproduce."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from ehdc_llpg_address_matching_ray.config import PipelineConfig
    from ehdc_llpg_address_matching_ray.pipelines.match import run_match

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    did = docs["doc_id"].to_numpy().astype(np.int64)
    txt = np.asarray(pc.fill_null(docs["text"], "").to_pylist(), dtype=object)
    n = len(did)

    keep = did % 11 != 3
    new_ids = did[keep].tolist()
    new_raw = [
        t + " v2" if i % 7 == 2 else (t + "  " if i % 7 == 4 else t)
        for i, t in zip(did[keep], txt[keep])
    ]
    status = ["updated" if i % 7 in (2, 4) else "unchanged" for i in did[keep]]
    add = did % 13 == 1
    new_ids += (did[add] + n).tolist()
    new_raw += txt[add].tolist()
    status += ["added"] * int(add.sum())

    gaz_mask = did % 5 == 0
    gaz = rd.from_arrow(
        pa.table(
            {
                "uprn": [str(i) for i in did[gaz_mask]],
                "full_address": [t.lower() for t in txt[gaz_mask]],
            }
        )
    )
    srcs = rd.from_arrow(
        pa.table({"src_id": [str(i) for i in new_ids], "raw_address": new_raw})
    )
    out = run_match(srcs, gaz, PipelineConfig(), fuzzy_tier=False)["matches"].to_pandas()
    st = pd.DataFrame({"src_id": [str(i) for i in new_ids], "src_status": status})
    out = out.merge(st, on="src_id")
    out["score"] = out["score"].astype("float64").round(4)
    return out


class TestIncrementalMatch:
    def test_equals_full_rematch(self, ray_session, sf_unit_dir):
        from ehdc_llpg_address_matching_ray.pipelines.queries import q_incremental_match

        cols = ["src_id", "matched_id", "score", "decision", "method", "src_status"]
        inc = (
            q_incremental_match(sf_unit_dir)
            .to_pandas()[cols]
            .sort_values(cols)
            .reset_index(drop=True)
        )
        full = (
            full_rematch_reference(sf_unit_dir)[cols]
            .sort_values(cols)
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(inc, full)
        # all three live statuses must actually occur at this scale
        assert set(inc["src_status"]) == {"unchanged", "updated", "added"}

    def test_cluster_split_leakage_safe(self, ray_session, sf_unit_dir):
        from ehdc_llpg_address_matching_ray.pipelines.queries import (
            q_cluster_split,
            q_train_split,
        )

        cs = q_cluster_split(sf_unit_dir).to_pandas()
        # a duplicate cluster is never straddled across splits
        assert cs.groupby("rep")["split"].nunique().max() == 1
        # a cluster REPRESENTATIVE gets the same assignment train_split
        # would give it standalone (same md5-bucket recipe)
        ts = q_train_split(sf_unit_dir).to_pandas().set_index("doc_id")["split"]
        reps = cs[cs["doc_id"] == cs["rep"]]
        assert (ts.reindex(reps["doc_id"]).to_numpy() == reps["split"].to_numpy()).all()
        # every doc accounted for exactly once
        assert cs["doc_id"].is_unique

    def test_deleted_sources_never_appear(self, ray_session, sf_unit_dir):
        from ehdc_llpg_address_matching_ray.pipelines.queries import q_incremental_match

        inc = q_incremental_match(sf_unit_dir).to_pandas()
        n = pq.read_metadata(f"{sf_unit_dir}/documents.parquet").num_rows
        ids = inc["src_id"].astype("int64").to_numpy()
        survivors = ids[ids < n]
        assert (survivors % 11 != 3).all()
