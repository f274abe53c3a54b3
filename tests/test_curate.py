"""End-to-end curation pipeline semantics on crafted inputs: quality
gates drop garbage, exact dup collapses to the min doc_id, MinHash
near-dups collapse to one representative, PII is scrubbed in place, the
split column is the deterministic md5 bucket, and the partitioned write
round-trips."""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ehdc_llpg_address_matching_ray.pipelines.curate import (
    CurationConfig,
    run_curation,
    write_curated,
)

GOOD = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
NEAR_A = (
    "the quick brown fox jumps over the lazy dog while seven wizards "
    "brew strange potions beneath ancient oak trees near the river"
)
NEAR_B = NEAR_A.replace("strange", "curious")


def _docs():
    rows = [
        (1, GOOD, "en"),
        (2, GOOD, "en"),  # exact dup of 1
        (3, NEAR_A, "en"),
        (4, NEAR_B, "en"),  # near dup of 3
        (5, "too short", "en"),  # fails min_tokens
        (6, "contact me at bob@corp-example.net or call +1-555-0100 today "
            "for details about the quarterly report and planning meeting", "en"),
        (7, GOOD + " zed", "zh"),  # dropped by the lang allow-list
    ]
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
        }
    )


@pytest.fixture(scope="module")
def curated_df(ray_session):
    import ray.data as rd

    cfg = CurationConfig(keep_langs=("en",))
    return run_curation(rd.from_arrow(_docs()), cfg).to_pandas()


class TestCuration:
    def test_quality_and_lang_gates(self, curated_df):
        ids = set(curated_df["doc_id"])
        assert 5 not in ids  # min_tokens
        assert 7 not in ids  # lang allow-list

    def test_exact_dedup_keeps_min_doc_id(self, curated_df):
        ids = set(curated_df["doc_id"])
        assert 1 in ids and 2 not in ids

    def test_neardup_collapses_to_one_rep(self, curated_df):
        ids = set(curated_df["doc_id"])
        assert len(ids & {3, 4}) == 1

    def test_pii_scrubbed_in_place(self, curated_df):
        row = curated_df[curated_df["doc_id"] == 6]
        assert len(row) == 1
        text = row["text"].iloc[0]
        assert "<EMAIL>" in text and "<PHONE>" in text
        assert "@" not in text
        assert int(row["n_emails"].iloc[0]) == 1
        assert int(row["n_phones"].iloc[0]) == 1

    def test_split_is_md5_bucket(self, curated_df):
        for _, r in curated_df.iterrows():
            b = int(hashlib.md5(str(int(r["doc_id"])).encode()).hexdigest()[:8], 16) % 1000
            exp = "train" if b < 900 else ("valid" if b < 950 else "test")
            assert r["split"] == exp

    def test_partitioned_write_roundtrip(self, ray_session, curated_df, tmp_path):
        import ray.data as rd

        cfg = CurationConfig(keep_langs=("en",))
        curated = run_curation(rd.from_arrow(_docs()), cfg)
        counts = write_curated(curated, str(tmp_path))
        assert sum(counts.values()) == len(curated_df)
        back = []
        for split, n in counts.items():
            p = os.path.join(str(tmp_path), f"split={split}")
            if n:
                t = pq.read_table(p)
                assert t.num_rows == n
                back.append(t.num_rows)
        assert sum(back) == len(curated_df)

    def test_neardup_disabled_keeps_both(self, ray_session):
        import ray.data as rd

        cfg = CurationConfig(keep_langs=("en",), neardup=False, redact_pii=False)
        df = run_curation(rd.from_arrow(_docs()), cfg).to_pandas()
        assert {3, 4} <= set(df["doc_id"])
