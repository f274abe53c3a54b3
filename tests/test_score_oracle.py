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


def test_dl1_pair_index_matches_brute_force():
    """build_dl1_pairs completeness + exactness: the deletes-bucket
    candidates verified with within_one_edit equal the brute-force DL-1
    adjacency over the eligible vocab; overflow returns None."""
    import itertools

    import numpy as np

    from ehdc_llpg_address_matching_ray.functions import symspell as SS
    from ehdc_llpg_address_matching_ray.stages.scoring import build_dl1_pairs

    vocab = sorted(
        set(
            "street stret sreet strete tsreet road rood raod lane lnae manor manot "
            "house houze mouse housse ab abc".split()
        )
    )
    isrest = np.array([w.isalpha() and len(w) >= 3 for w in vocab])
    keys = build_dl1_pairs(vocab, isrest)
    got = {(int(k) >> 32, int(k) & 0xFFFFFFFF) for k in keys.tolist()}
    want = set()
    el = [i for i in range(len(vocab)) if isrest[i]]
    for a, b in itertools.combinations(el, 2):
        if SS.within_one_edit(vocab[a], vocab[b]):
            want.add((a, b))
            want.add((b, a))
    assert got == want
    assert build_dl1_pairs(vocab, isrest, max_candidates=1) is None
