"""Scale-path data-processing operators vs their DuckDB oracles at
sf0.001: exact-substring duplication (Lee et al. 2022), SemDeDup
embedding-cluster pruning, per-key rolling window, time-band range join
and DSIR importance weights.  Each must be value-identical to its SQL
twin (the driver's canonical compare: sorted columns, sorted rows, 6-dp
float rounding), plus semantic spot checks."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from oracle_utils import canon_frame, duck_oracle

from ehdc_llpg_address_matching_ray.pipelines.queries import ORACLE_SQL, QUERIES

OPS = [
    "substring_dedup",
    "semdedup",
    "rolling_window",
    "range_join_clicks",
    "dsir_weights",
]


@pytest.mark.parametrize("name", OPS)
def test_query_matches_oracle(name, ray_session, sf_unit_dir):
    ray_df = canon_frame(QUERIES[name](sf_unit_dir).to_pandas())
    sql_df = canon_frame(duck_oracle(sf_unit_dir, ORACLE_SQL[name]))
    assert len(ray_df) == len(sql_df) > 0, name
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False)


def test_semdedup_survivor_rule(ray_session, sf_unit_dir):
    df = QUERIES["semdedup"](sf_unit_dir).to_pandas()
    # the smallest vec_id of every cluster has nothing ranked before it
    firsts = df.loc[df.groupby("list_id")["vec_id"].idxmin()]
    assert not firsts["pruned"].any()
    assert df["pruned"].any()  # tau chosen so pruning actually happens


def test_semdedup_chunked_cap_bounds_hot_cluster():
    """100x blow-up of one hot cluster: per-row comparison work stays
    bounded by the chunk cap (each matmul is at most cap x cap), and the
    chunked verdicts match the SQL twin's rank//cap rule — a vector is
    pruned iff a same-chunk predecessor is within tau."""
    import numpy as np

    from ehdc_llpg_address_matching_ray.pipelines.queries import (
        _SEMDEDUP_TAU,
        semdedup_prune_chunked,
    )

    rng = np.random.default_rng(7)
    cap = 32
    n = cap * 100  # a cluster 100x the cap — the pre-fix quadratic case
    mat = rng.normal(size=8)[None, :] + 0.01 * rng.normal(size=(n, 8))
    matn = mat / np.linalg.norm(mat, axis=1)[:, None]
    pruned = semdedup_prune_chunked(matn, cap)
    # all vectors are near-identical (cos >> tau), so exactly each
    # chunk's first row survives under the rank//cap rule
    expect = np.ones(n, dtype=bool)
    expect[::cap] = False
    assert (pruned == expect).all()
    # single-chunk clusters reduce to the uncapped lower-triangle rule
    small = matn[:cap]
    sims = small @ small.T
    ref = (np.tril(sims, k=-1) >= _SEMDEDUP_TAU).any(axis=1)
    assert (semdedup_prune_chunked(small, cap) == ref).all()


def test_substring_dedup_bounds(ray_session, sf_unit_dir):
    df = QUERIES["substring_dedup"](sf_unit_dir).to_pandas()
    assert (df["n_dup"] <= df["n_grams"]).all()
    assert (df["dup_frac"] <= 1.0).all() and (df["dup_frac"] >= 0.0).all()


def test_rolling_window_first_row_identity(ray_session, sf_unit_dir):
    out = QUERIES["rolling_window"](sf_unit_dir).to_pandas()
    ev = pd.read_parquet(os.path.join(sf_unit_dir, "events.parquet"))
    first = (
        ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        .groupby("user_id", sort=False)
        .first()
        .reset_index()
    )
    m = out.merge(first, on=["event_id", "user_id"])
    assert len(m) == ev["user_id"].nunique()
    assert (m["avg3"].round(6) == m["value"].round(6)).all()


def test_range_join_brute_force_one_user(ray_session, sf_unit_dir):
    out = QUERIES["range_join_clicks"](sf_unit_dir).to_pandas()
    ev = pd.read_parquet(os.path.join(sf_unit_dir, "events.parquet"))
    pur = ev[ev.event_type == "purchase"]
    clk = ev[ev.event_type == "click"]
    assert len(out) == len(pur)
    u = pur["user_id"].mode().iloc[0]  # the busiest purchaser
    for _, p in pur[pur.user_id == u].iterrows():
        want = (
            (clk.user_id == u)
            & (clk.ts >= p.ts - pd.Timedelta(minutes=10))
            & (clk.ts < p.ts)
        ).sum()
        got = out.loc[out.event_id == p.event_id, "n_clicks_10m"].iloc[0]
        assert got == want


def test_dsir_weights_favor_target_lang(ray_session, sf_unit_dir):
    out = QUERIES["dsir_weights"](sf_unit_dir).to_pandas()
    docs = pd.read_parquet(os.path.join(sf_unit_dir, "documents.parquet"))
    m = out.merge(docs[["doc_id", "lang"]], on="doc_id")
    per_tok = m["log_weight"] / m["n_tokens"]
    assert per_tok[m.lang == "en"].mean() > per_tok[m.lang != "en"].mean()
