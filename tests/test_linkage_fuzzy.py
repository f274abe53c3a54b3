"""Full-strength fuzzy linkage fact vs its composed DuckDB twin
(SQL_LINKAGE_FACT_FUZZY): the flagship DAG with MinHash-LSH blocking,
production scoring, decide and TRANSITIVE clustering all enabled, value-
identical to the SQL composition (minhash kernel over rep canonicals →
scored-pairs CTEs → decide window → recursive reachability closure).
Complements q_linkage_fact's exact-only gate — this is the fuzzy-scored
transitive-clustering path end-to-end."""

from __future__ import annotations

import pandas as pd

from oracle_utils import canon_frame, duck_oracle

from ehdc_llpg_address_matching_ray.pipelines.queries import ORACLE_SQL, QUERIES


def test_fuzzy_fact_matches_oracle(ray_session, sf_unit_dir):
    ray_df = QUERIES["linkage_fact_fuzzy"](sf_unit_dir).to_pandas()

    # semantic spot checks BEFORE canonicalization: the fuzzy path must
    # actually fire — accepted decisions exist and at least one cluster
    # spans multiple representatives (transitive fuzzy clustering, not
    # just exact-dup fan-out)
    decs = set(ray_df["decision"])
    assert "auto_accept" in decs and "no_candidates" in decs
    reps_per_cluster = (
        ray_df[~ray_df["is_exact_dup"]].groupby("cluster_id")["url"].size()
    )
    assert (reps_per_cluster > 1).any(), "no multi-rep fuzzy cluster formed"
    # every member inherits its cluster stats consistently
    g = ray_df.groupby("cluster_id")
    assert (g["url"].transform("size") == ray_df["cluster_size"]).all()
    assert (g["url"].transform("min") == ray_df["cluster_rep_url"]).all()

    sql_df = canon_frame(duck_oracle(sf_unit_dir, ORACLE_SQL["linkage_fact_fuzzy"]))
    ray_df = canon_frame(ray_df)
    assert len(ray_df) == len(sql_df) > 0
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False)
