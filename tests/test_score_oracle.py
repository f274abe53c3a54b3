"""The production pair score vs its DuckDB twin (VERDICT r2 item 1).

q_scored_pairs_projection recomputes the PairScorer's full production
blend — Jaro-Winkler, token-set ratio including the greedy DL-1 leftover
rescue, exact-idf TF-IDF cosine, house-number veto — in SQL generated
from the same rule tables.  Values must agree bit-for-bit after 6-dp
rounding on every adjacent-doc pair.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from ehdc_llpg_address_matching_ray.pipelines.queries import (
    SQL_SCORED_PAIRS_PROJECTION,
    q_scored_pairs_projection,
)

VALUE_COLS = ["jaro_winkler", "token_set_ratio", "tfidf_cosine", "score"]


def test_scored_pairs_projection_matches_sql(ray_session, sf_unit_dir):
    ray_df = (
        q_scored_pairs_projection(sf_unit_dir)
        .to_pandas()
        .sort_values(["id_a"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(sf_unit_dir, 'documents.parquet')}')"
    )
    sql_df = (
        con.execute(SQL_SCORED_PAIRS_PROJECTION)
        .df()
        .sort_values(["id_a"])
        .reset_index(drop=True)
    )
    assert len(ray_df) == len(sql_df) > 0
    merged = ray_df.merge(sql_df, on=["id_a", "id_b"], suffixes=("_ray", "_sql"))
    assert len(merged) == len(ray_df)
    for c in VALUE_COLS:
        pd.testing.assert_series_equal(
            merged[c + "_ray"], merged[c + "_sql"], check_names=False, atol=0, rtol=0
        )
    assert (merged["house_veto_ray"] == merged["house_veto_sql"]).all()
    # the pair set must exercise the interesting paths, not just zeros
    assert (merged["score_ray"] > 0).any()
    assert merged["token_set_ratio_ray"].gt(0).any()
