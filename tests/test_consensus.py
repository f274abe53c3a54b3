"""G1 SAFE group-consensus gate tests (cmd/matcher-v2/main.go:801-1012)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from ehdc_llpg_address_matching_ray.pipelines.consensus import (
    _group_gate,
    group_consensus_corrections,
)

REAL = "12 High Street, Alton"  # passes is_real_address
REAL2 = "14 High Street, Alton"
PLAN = "F12345"  # planning-ref shaped, NOT real


def g(rows):
    return pd.DataFrame(
        rows, columns=["src_id", "raw_address", "group_key", "matched_id", "m_score"]
    )


class TestGateSet:
    def base_group(self, gk="g1"):
        """5 members: 3 vote for U1 (>0.5), 1 unmatched real, 1 planning ref."""
        return [
            ("a", REAL, gk, "U1", 0.9),
            ("b", REAL, gk, "U1", 0.8),
            ("c", REAL2, gk, "U1", 0.7),
            ("d", REAL, gk, None, 0.0),
            ("e", PLAN, gk, None, 0.0),
        ]

    def test_happy_path_corrects_unmatched_real_member(self):
        out = _group_gate(g(self.base_group()))
        # d (unmatched, real) is corrected; e is not (planning ref);
        # a/b/c already carry the consensus id
        assert set(out["src_id"]) == {"d"}
        assert out.iloc[0]["corrected_id"] == "U1"
        assert out.iloc[0]["confidence"] == 0.90  # 3 votes -> 0.90 band

    def test_vote_bands(self):
        # 5 voters -> 0.95
        rows = [(f"v{i}", REAL, "g1", "U1", 0.9) for i in range(5)] + [
            ("d", REAL, "g1", None, 0.0)
        ]
        out = _group_gate(g(rows))
        assert out.iloc[0]["confidence"] == 0.95
        # 2 voters -> 0.85
        rows = [(f"v{i}", REAL, "g2", "U1", 0.9) for i in range(2)] + [
            ("d", REAL, "g2", None, 0.0)
        ]
        out = _group_gate(g(rows))
        assert out.iloc[0]["confidence"] == 0.85

    def test_group_size_bounds(self):
        # size 1: never
        assert len(_group_gate(g([("a", REAL, "g", "U1", 0.9)]))) == 0
        # size 31: never
        rows = [(f"s{i}", REAL, "g", "U1", 0.9) for i in range(30)] + [
            ("d", REAL, "g", None, 0.0)
        ]
        assert len(_group_gate(g(rows))) == 0

    def test_all_matched_group_skipped(self):
        rows = [(f"s{i}", REAL, "g", "U1", 0.9) for i in range(3)]
        assert len(_group_gate(g(rows))) == 0

    def test_real_address_ratio_gate(self):
        # 2 real / 5 total = 40% < 60% -> skipped
        rows = [
            ("a", REAL, "g", "U1", 0.9),
            ("b", REAL, "g", "U1", 0.9),
            ("c", PLAN, "g", None, 0.0),
            ("d", "G99999", "g", None, 0.0),
            ("e", "H11111", "g", None, 0.0),
        ]
        assert len(_group_gate(g(rows))) == 0

    def test_planning_ref_cap(self):
        # 4 planning refs > 3 -> skipped even if ratio ok (10 real, 4 refs)
        rows = [(f"r{i}", f"{i} High Street, Alton", "g", "U1", 0.9) for i in range(4)]
        rows += [(f"r{i+4}", f"{i} High Street, Alton", "g", None, 0.0) for i in range(6)]
        rows += [(f"p{i}", PLAN, "g", None, 0.0) for i in range(4)]
        out = _group_gate(g(rows))
        assert len(out) == 0

    def test_address_variation_cap(self):
        # 6 distinct 20-char prefixes among real addresses -> skipped
        rows = [
            (f"s{i}", f"{i} Different Road Number {i}, Town{i}", "g", "U1", 0.9)
            for i in range(6)
        ] + [("d", "7 Another Lane, Liss", "g", None, 0.0)]
        assert len(_group_gate(g(rows))) == 0

    def test_min_votes_gate(self):
        # single voter -> votes=1 < 2 -> skipped
        rows = [
            ("a", REAL, "g", "U1", 0.9),
            ("d", REAL, "g", None, 0.0),
        ]
        assert len(_group_gate(g(rows))) == 0

    def test_vote_fraction_gate(self):
        # 2 consensus votes but 6 matched (>0) docs -> 2 < 0.4*6 -> skipped
        rows = [
            ("a", REAL, "g", "U1", 0.9),
            ("b", REAL, "g", "U1", 0.9),
            ("c", REAL, "g", "U2", 0.6),
            ("e2", REAL2, "g", "U3", 0.6),
            ("f", REAL2, "g", "U4", 0.6),
            ("h", REAL2, "g", "U5", 0.6),
            ("d", REAL, "g", None, 0.0),
        ]
        assert len(_group_gate(g(rows))) == 0

    def test_wrong_id_member_is_rewritten(self):
        rows = self.base_group() + [("w", REAL2, "g1", "U9", 0.95)]
        out = _group_gate(g(rows))
        # consensus still U1 (3 votes vs 1); w is real + non-consensus -> corrected
        assert set(out["src_id"]) == {"d", "w"}
        assert set(out["corrected_id"]) == {"U1"}

    def test_tie_break_deterministic(self):
        # U1 and U2 with 2 votes each, same max score -> min id wins
        rows = [
            ("a", REAL, "g", "U2", 0.9),
            ("b", REAL, "g", "U2", 0.9),
            ("c", REAL, "g", "U1", 0.9),
            ("e3", REAL2, "g", "U1", 0.9),
            ("d", REAL, "g", None, 0.0),
        ]
        out = _group_gate(g(rows))
        assert set(out["corrected_id"]) == {"U1"}


class TestDistributed:
    def test_end_to_end_dataset(self, ray_session):
        sources = rd.from_arrow(
            pa.table(
                {
                    "src_id": ["a", "b", "c", "d", "e"],
                    "raw_address": [REAL, REAL, REAL2, REAL, PLAN],
                    "group_key": ["g1"] * 5,
                }
            )
        )
        matches = rd.from_arrow(
            pa.table(
                {
                    "src_id": ["a", "b", "c"],
                    "matched_id": ["U1", "U1", "U1"],
                    "score": [0.9, 0.8, 0.7],
                }
            )
        )
        out = group_consensus_corrections(sources, matches).to_pandas()
        assert set(out["src_id"]) == {"d"}
        assert out.iloc[0]["corrected_id"] == "U1"
        assert out.iloc[0]["confidence"] == 0.90
