"""Link-graph, packing and clustering operators vs their DuckDB oracles
at sf0.001 — degree table, two-iteration PageRank, per-domain crawl
stats, training-sequence packing, one k-means Lloyd iteration — plus
semantic invariants (rank mass conservation, degree symmetry, per-shard
packing monotonicity, cluster-size completeness)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from oracle_utils import canon_frame, duck_oracle

from ehdc_llpg_address_matching_ray.pipelines.queries import (
    _PACK_CAP,
    ORACLE_SQL,
    QUERIES,
)

GRAPH_PACK = [
    "link_degree",
    "pagerank",
    "domain_stats",
    "sequence_pack",
    "kmeans_iter",
    "local_supplier_volume",
    "pmi_bigrams",
    "funnel",
    "snapshot_diff",
    "pivot_events",
    "bfs_hops",
    "corpus_report",
    "minhash_pairs_exact",
    "brand_revenue",
    "suppliers_per_nation",
    "vocab_coverage",
    "retention_cohorts",
    "link_components",
    "blocking_skew",
    "latest_event_per_user",
]


def test_latest_event_is_users_max(ray_session, sf_unit_dir):
    """Compaction keeps exactly one row per user, and it is that user's
    (ts, event_id) maximum in the raw log."""
    import duckdb

    df = QUERIES["latest_event_per_user"](sf_unit_dir).to_pandas()
    assert df["user_id"].is_unique
    con = duckdb.connect()
    raw = con.execute(
        "SELECT user_id, max(ts) AS mts FROM read_parquet('"
        + f"{sf_unit_dir}/events.parquet') GROUP BY 1"
    ).df()
    m = df.merge(raw, on="user_id")
    assert len(m) == len(raw)
    assert (m["ts"] == m["mts"]).all()


def test_blocking_skew_accounts_every_doc_band_row(ray_session, sf_unit_dir):
    """Histogram conservation: n_docs summed over size classes equals
    docs x bands (every (doc, band) row lands in exactly one bucket)."""
    import pyarrow.parquet as pq

    df = QUERIES["blocking_skew"](sf_unit_dir).to_pandas()
    n_docs = pq.read_metadata(f"{sf_unit_dir}/documents.parquet").num_rows
    per_band = df.groupby("band_idx")["n_docs"].sum()
    assert (per_band == n_docs).all()
    # singleton buckets generate zero pairs
    assert (df.loc[df["size_log2"] == 0, "pair_mass"] == 0).all()


def test_link_components_fixpoint_semantics(ray_session, sf_unit_dir):
    """Every component label is the min doc_id of its member set, and
    labels are closed: a node's component equals its label's component."""
    df = QUERIES["link_components"](sf_unit_dir).to_pandas()
    comp = df.set_index("node")["component"]
    assert (comp.loc[comp.to_numpy()].to_numpy() == comp.to_numpy()).all()
    mins = df.groupby("component")["node"].min()
    assert (mins.to_numpy() == mins.index.to_numpy()).all()


@pytest.mark.parametrize("name", GRAPH_PACK)
def test_query_matches_oracle(name, ray_session, sf_unit_dir):
    ray_df = canon_frame(QUERIES[name](sf_unit_dir).to_pandas())
    sql_df = canon_frame(duck_oracle(sf_unit_dir, ORACLE_SQL[name]))
    assert len(ray_df) == len(sql_df) > 0, name
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False)


def test_degree_symmetry_and_pagerank_mass(ray_session, sf_unit_dir):
    deg = QUERIES["link_degree"](sf_unit_dir).to_pandas()
    # every emitted edge has exactly one source and one destination
    assert deg["out_deg"].sum() == deg["in_deg"].sum() > 0
    assert (deg["out_deg"] >= 1).all()  # no dangling nodes by construction
    pr = QUERIES["pagerank"](sf_unit_dir).to_pandas()
    assert len(pr) == len(deg)
    # scaled ranks average ~1.0 (total mass is conserved up to damping leaks)
    assert abs(pr["pr_scaled"].mean() - 1.0) < 1e-3
    assert (pr["pr_scaled"] > 0).all()


def test_sequence_pack_monotone_per_shard(ray_session, sf_unit_dir):
    d = (
        QUERIES["sequence_pack"](sf_unit_dir)
        .to_pandas()
        .sort_values(["shard", "doc_id"])
    )
    for _, g in d.groupby("shard"):
        seq = g["seq_id"].to_numpy()
        assert (np.diff(seq) >= 0).all()  # never goes backwards
        # first doc of each shard starts in sequence 0
        assert seq[0] == 0
        # every doc's START offset must land inside its sequence window:
        # recompute exclusive prefix sums and check the cap bound
        start = np.cumsum(g["n_tokens"].to_numpy()) - g["n_tokens"].to_numpy()
        assert (start // _PACK_CAP == seq).all()
    # all docs starting in one (shard, seq) minus its last doc fit the cap
    tot = d.groupby(["shard", "seq_id"])["n_tokens"].sum()
    last = d.groupby(["shard", "seq_id"])["n_tokens"].last()
    assert ((tot - last) < _PACK_CAP).all()
    assert d["n_tokens"].min() >= 1


def test_kmeans_cluster_sizes_cover_corpus(ray_session, sf_unit_dir):
    km = QUERIES["kmeans_iter"](sf_unit_dir).to_pandas()
    sizes = km.groupby("cluster_id")["n_cluster"].first()
    import pyarrow.parquet as pq

    n = pq.read_metadata(
        os.path.join(sf_unit_dir, "embeddings.parquet")
    ).num_rows
    assert sizes.sum() == n
    # every cluster reports every dimension exactly once
    assert (km.groupby("cluster_id")["dim"].count() == km["dim"].max()).all()


def test_pmi_semantics(ray_session, sf_unit_dir):
    d = QUERIES["pmi_bigrams"](sf_unit_dir).to_pandas()
    from ehdc_llpg_address_matching_ray.pipelines.queries import _PMI_MINC

    assert (d["pair_count"] >= _PMI_MINC).all()
    # collocations exist above AND below independence (pmi spans zero)
    assert d["pmi"].max() > 0 > d["pmi"].min()


def test_funnel_stages_monotone(ray_session, sf_unit_dir):
    d = QUERIES["funnel"](sf_unit_dir).to_pandas()
    assert set(d["funnel_stage"].unique()) <= {0, 1, 2, 3}
    # the 2-day windows must actually discriminate on this corpus
    assert d["funnel_stage"].nunique() >= 2


def test_snapshot_diff_classes(ray_session, sf_unit_dir):
    d = QUERIES["snapshot_diff"](sf_unit_dir).to_pandas()
    counts = d["status"].value_counts()
    # all four CDC classes occur and partition the id universe
    assert set(counts.index) == {"unchanged", "updated", "deleted", "added"}
    assert d["doc_id"].is_unique


def test_bfs_hops_semantics(ray_session, sf_unit_dir):
    d = QUERIES["bfs_hops"](sf_unit_dir).to_pandas()
    counts = d["hops"].value_counts()
    assert counts.get(0, 0) == 5  # the seed set
    # every hop level reached, frontier grows, rest unreachable
    assert counts.get(1, 0) > 0 and counts.get(2, 0) > 0 and counts.get(-1, 0) > 0


def test_corpus_report_rollup_consistency(ray_session, sf_unit_dir):
    d = QUERIES["corpus_report"](sf_unit_dir).to_pandas()
    total = d[(d["lang"] == "*") & (d["source"] == "*")]
    fine = d[(d["lang"] != "*") & (d["source"] != "*")]
    by_lang = d[(d["lang"] != "*") & (d["source"] == "*")]
    # every rollup level must sum to the same grand totals
    assert fine["n_docs"].sum() == by_lang["n_docs"].sum() == int(total["n_docs"].iloc[0])
    assert fine["total_chars"].sum() == int(total["total_chars"].iloc[0])


def test_minhash_pairs_exact_contains_exact_dups(ray_session, sf_unit_dir):
    """Identical texts share every band key, so every exact-dup pair
    must appear in the LSH candidate set."""
    import duckdb as _dd
    import os as _os

    pairs = QUERIES["minhash_pairs_exact"](sf_unit_dir).to_pandas()
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    dup = _dd.connect().execute(
        "SELECT a.doc_id, b.doc_id FROM read_parquet($p) a "
        "JOIN read_parquet($p) b ON md5(a.text) = md5(b.text) "
        "AND a.doc_id < b.doc_id AND a.text != ''",
        {"p": _os.path.join(sf_unit_dir, "documents.parquet")},
    ).df()
    for t in dup.itertuples(index=False):
        assert (t[0], t[1]) in got


def test_vocab_coverage_bounds(ray_session, sf_unit_dir):
    d = QUERIES["vocab_coverage"](sf_unit_dir).to_pandas()
    assert (d["vocab_90"] <= d["vocab_size"]).all()
    assert (d["vocab_90"] >= 1).all()
    assert (d["total_tokens"] >= d["vocab_size"]).all()


def test_retention_cohorts_monotone(ray_session, sf_unit_dir):
    d = QUERIES["retention_cohorts"](sf_unit_dir).to_pandas()
    # offset-0 row exists per cohort and is the cohort maximum
    for _, g in d.groupby("cohort_week"):
        g = g.sort_values("week_offset")
        assert g["week_offset"].iloc[0] == 0
        assert g["n_users"].iloc[0] == g["n_users"].max()
