"""Retrieval/sampling operators vs their DuckDB oracles at sf0.001:
BM25 term-weighted top-k and Efraimidis-Spirakis weighted sampling —
plus semantic checks (BM25 top doc is query-term dense; the sample key
prefers heavier docs in expectation)."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from oracle_utils import canon_frame, duck_oracle

from ehdc_llpg_address_matching_ray.pipelines.queries import (
    _BM25_TERMS,
    ORACLE_SQL,
    QUERIES,
)

RETRIEVAL = ["weighted_sample", "bm25_topk"]


@pytest.mark.parametrize("name", RETRIEVAL)
def test_query_matches_oracle(name, ray_session, sf_unit_dir):
    ray_df = canon_frame(QUERIES[name](sf_unit_dir).to_pandas())
    sql_df = canon_frame(duck_oracle(sf_unit_dir, ORACLE_SQL[name]))
    assert len(ray_df) == len(sql_df) > 0, name
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False)


def test_bm25_top_doc_is_term_dense(ray_session, sf_unit_dir):
    top = QUERIES["bm25_topk"](sf_unit_dir).to_pandas()
    assert (top["bm25"] > 0).all()
    # scores must be sorted descending with doc_id tiebreak
    key = list(zip(-top["bm25"], top["doc_id"]))
    assert key == sorted(key)
    # the best doc really contains query terms
    con = duckdb.connect()
    txt = con.execute(
        "SELECT text FROM read_parquet("
        f"'{os.path.join(sf_unit_dir, 'documents.parquet')}') "
        f"WHERE doc_id = {int(top['doc_id'].iloc[0])}"
    ).fetchone()[0]
    assert sum(t in txt.split() for t in _BM25_TERMS) >= 2


def test_weighted_sample_prefers_heavy_docs(ray_session, sf_unit_dir):
    sample = QUERIES["weighted_sample"](sf_unit_dir).to_pandas()
    con = duckdb.connect()
    pop = con.execute(
        "SELECT avg(greatest(n_chars, 1)) FROM read_parquet("
        f"'{os.path.join(sf_unit_dir, 'documents.parquet')}')"
    ).fetchone()[0]
    # weight-proportional sampling: the sampled mean weight exceeds the
    # population mean (deterministic given the fixed md5 uniforms)
    assert sample["weight"].mean() > pop
    # keys are ln(u)/w <= 0 and sorted descending
    assert (sample["sample_key"] <= 0).all()
    assert sample["sample_key"].is_monotonic_decreasing
