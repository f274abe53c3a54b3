"""End-to-end pipeline tests: F1 gate, extraction byte-identity,
checkpoint/resume, cluster-path equivalence, empty input.

The conformance strategy is FIXTURES.md: the reference repo has no e2e
tests (SURVEY.md §5), so the gate is our own seeded corpus with planted
duplicate clusters (sources/corpus.py) and pairwise F1 >= 0.99 on the
labeled pairs (BASELINE.json north_rule).
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from ehdc_llpg_address_matching_ray.config import PipelineConfig
from ehdc_llpg_address_matching_ray.pipelines.linkage import run_linkage
from ehdc_llpg_address_matching_ray.sources.corpus import write_corpus
from ehdc_llpg_address_matching_ray.stages import cluster as C
from ehdc_llpg_address_matching_ray.stages.extract import extract_text_batch

CORPUS_DIR = "/tmp/ehdc_llpg_address_matching_ray_test_corpus"
N_ENTITIES = 50


@pytest.fixture(scope="session")
def corpus_dir(ray_session):
    return write_corpus(CORPUS_DIR, n_entities=N_ENTITIES, seed=42)


@pytest.fixture(scope="session")
def linkage_out(corpus_dir):
    pages = rd.read_parquet(os.path.join(corpus_dir, "pages"))
    return run_linkage(pages, PipelineConfig(), from_html=True)


def pairwise_f1(fact_df, labeled):
    cl = fact_df.set_index("url")["cluster_id"]
    pred = cl.reindex(labeled.url_a).to_numpy() == cl.reindex(labeled.url_b).to_numpy()
    tp = int((pred & labeled.is_match).sum())
    fp = int((pred & ~labeled.is_match).sum())
    fn = int((~pred & labeled.is_match).sum())
    p = tp / max(1, tp + fp)
    r = tp / max(1, tp + fn)
    return 2 * p * r / max(1e-9, p + r), p, r


class TestFlagshipLinkage:
    def test_pairwise_f1_gate(self, linkage_out, corpus_dir):
        """North-rule gate: F1 >= 0.99 on labeled pairs, precision-first."""
        fact = linkage_out["fact"].to_pandas()
        labeled = pq.read_table(os.path.join(corpus_dir, "labeled_pairs.parquet")).to_pandas()
        f1, p, r = pairwise_f1(fact, labeled)
        assert f1 >= 0.99, f"F1={f1:.4f} P={p:.4f} R={r:.4f}"
        assert p >= 0.995, f"precision={p:.4f}"

    def test_every_page_in_fact(self, linkage_out, corpus_dir):
        fact = linkage_out["fact"].to_pandas()
        pages = pq.read_table(os.path.join(corpus_dir, "pages_truth.parquet"))
        assert len(fact) == pages.num_rows
        assert fact["url"].is_unique

    def test_exact_dups_share_cluster(self, linkage_out):
        """G3 fan-out: members of an exact-dup group inherit the rep's
        cluster."""
        fact = linkage_out["fact"].to_pandas()
        per_hash = fact.groupby("text_hash")["cluster_id"].nunique()
        assert (per_hash == 1).all()

    def test_cluster_sizes_consistent(self, linkage_out):
        fact = linkage_out["fact"].to_pandas()
        sizes = fact.groupby("cluster_id").size()
        recorded = fact.groupby("cluster_id")["cluster_size"].first()
        assert (sizes == recorded).all()


class TestPayloadPathEquivalence:
    def test_join_path_matches_broadcast(self, linkage_out, corpus_dir):
        """The non-broadcast payload path (pair-sized hash joins instead
        of the broadcast lookup — the 100-TB fallback when the rep
        payload exceeds the byte gate) must produce the same fact table:
        same clusters, same decisions, same accepted urls."""
        pages = rd.read_parquet(os.path.join(corpus_dir, "pages"))
        out = run_linkage(
            pages, PipelineConfig(broadcast_payload_max=0), from_html=True
        )
        a = (
            linkage_out["fact"]
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        b = out["fact"].to_pandas().sort_values("url").reset_index(drop=True)
        for col in ("cluster_id", "decision", "cluster_size", "is_exact_dup"):
            assert (a[col].to_numpy() == b[col].to_numpy()).all(), col
        assert np.allclose(a["top_score"], b["top_score"])


class TestExtractionByteIdentity:
    def test_extracted_equals_carried_text(self, corpus_dir):
        """input_hint invariant: byte-identical extracted text per url."""
        pages = pq.read_table(os.path.join(corpus_dir, "pages"))
        extracted = extract_text_batch(pages["html"].combine_chunks())
        carried = pages["text"].combine_chunks()
        assert extracted.to_pylist() == carried.to_pylist()


class TestResume:
    def test_checkpoint_resume_identical(self, corpus_dir):
        ck = "/tmp/ehdc_llpg_address_matching_ray_test_ckpt"
        shutil.rmtree(ck, ignore_errors=True)
        pages = rd.read_parquet(os.path.join(corpus_dir, "pages"))
        f1 = (
            run_linkage(pages, PipelineConfig(), from_html=True, checkpoint_dir=ck)["fact"]
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        f2 = (
            run_linkage(pages, PipelineConfig(), from_html=True, checkpoint_dir=ck, resume=True)[
                "fact"
            ]
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        cols = ["url", "cluster_id", "decision", "cluster_size"]
        assert f1[cols].equals(f2[cols])
        # manifests exist for every stage
        stages = sorted(os.listdir(ck))
        assert stages == [
            "01_normalized",
            "01b_corrected",
            "02_membership",
            "03_pairs",
            "04_scored",
            "05_decisions",
            "06_clusters",
            "07_fact",
        ]
        shutil.rmtree(ck, ignore_errors=True)


class TestClusterPaths:
    def _partitions(self, df):
        return sorted(
            tuple(sorted(g)) for _, g in df.groupby("cluster_id")["url"]
        )

    def test_labelprop_equals_union_find(self, ray_session):
        urls = [f"u{i}" for i in range(12)]
        nodes = rd.from_arrow(pa.table({"url": urls}))
        edges = rd.from_arrow(
            pa.table(
                {
                    "url_a": ["u0", "u1", "u4", "u5", "u6", "u9"],
                    "url_b": ["u1", "u2", "u5", "u6", "u7", "u10"],
                }
            )
        )
        lp = C.label_propagation(nodes, edges).to_pandas()
        uf = C.driver_union_find(nodes, edges).to_pandas()
        assert self._partitions(lp) == self._partitions(uf)

    def test_node_id_collision_free(self, corpus_dir):
        pages = pq.read_table(os.path.join(corpus_dir, "pages_truth.parquet"))
        urls = pages["url"].to_pylist()
        ids = C.url_to_node_id(urls)
        assert len(np.unique(ids)) == len(urls)


class TestEmptyInput:
    def test_empty_pages(self, corpus_dir, ray_session):
        pages = pq.read_table(os.path.join(corpus_dir, "pages"))
        empty = rd.from_arrow(pages.slice(0, 0))
        out = run_linkage(empty, PipelineConfig(), from_html=True)
        assert out["fact"].count() == 0
