"""Training-data curation queries vs their DuckDB oracles at sf0.001:
Gopher quality signals, vocabulary top-k, stratified sampling, exact
distributed quantiles, benchmark decontamination, PII redaction and
line-level exact dedup.  Each must be value-identical to its SQL twin
(the driver's canonical compare: sorted columns, sorted rows, 6-dp float
rounding)."""

from __future__ import annotations


import pandas as pd
import pytest

from oracle_utils import canon_frame, duck_oracle

from ehdc_llpg_address_matching_ray.pipelines.queries import ORACLE_SQL, QUERIES

CURATION = [
    "gopher_quality",
    "vocab_topk",
    "stratified_sample",
    "length_quantiles",
    "decontaminate",
    "pii_redact",
    "line_dedup",
    "curation_projection",
    "unigram_logppl",
]


@pytest.mark.parametrize("name", CURATION)
def test_query_matches_oracle(name, ray_session, sf_unit_dir):
    ray_df = canon_frame(QUERIES[name](sf_unit_dir).to_pandas())
    sql_df = canon_frame(duck_oracle(sf_unit_dir, ORACLE_SQL[name]))
    assert len(ray_df) == len(sql_df) > 0, name
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False)


def test_line_dedup_removes_cross_doc_duplicates(ray_session, sf_unit_dir):
    df = QUERIES["line_dedup"](sf_unit_dir).to_pandas()
    # the shared boilerplate header exists on every even doc but is kept
    # exactly once globally
    assert (df["n_kept"] < df["n_lines"]).any()
    even = df[df["doc_id"] % 2 == 0]
    assert int((even["n_lines"] - even["n_kept"]).sum()) >= len(even) - 1


def test_decontaminate_flags_overlap(ray_session, sf_unit_dir):
    df = QUERIES["decontaminate"](sf_unit_dir).to_pandas()
    assert (df["doc_id"] % 29 != 0).all()  # benchmark rows excluded
    assert df["contaminated"].any()
    assert (df.loc[df["contaminated"], "n_shared"] > 0).all()


def test_pii_redact_scrubs_everything(ray_session, sf_unit_dir):
    df = QUERIES["pii_redact"](sf_unit_dir).to_pandas()
    injected = df[df["doc_id"] % 3 == 0]
    assert (injected["n_emails"] >= 1).all()
    assert df["redacted"].str.contains("@").sum() == 0
    assert not df["redacted"].str.contains(r"\+1-\d{3}-\d{4}", regex=True).any()


def test_gopher_quality_keep_semantics(ray_session, sf_unit_dir):
    df = QUERIES["gopher_quality"](sf_unit_dir).to_pandas()
    kept = df[df["keep"]]
    assert (kept["n_tokens"] >= 10).all()
    assert (kept["top_tok_frac"] <= 0.2).all()
