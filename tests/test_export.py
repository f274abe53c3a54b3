"""S4 enhanced exporter tests (internal/engine/exporter.go:60-440)."""

from __future__ import annotations

import glob
import os

import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from ehdc_llpg_address_matching_ray.pipelines.export import (
    _address_quality,
    _token_jaccard,
    enhance_matches,
    export_enhanced_csvs,
)


class TestQuality:
    def test_bands(self):
        raw = pd.Series(
            [
                "12 Monks Orchard Road, Alton",  # len>=15(+2) digit(+1) = 3 -> FAIR
                "xx",                            # trimmed <=3 -> POOR
                "N A",                           # POOR override
                "Short 1",                       # len<8 -> digit only = 1 -> POOR
            ]
        )
        pc_ = pd.Series(["GU34 1AA", "", "", ""])
        coords = pd.Series([True, False, False, False])
        out = _address_quality(raw, pc_, coords)
        # row 0: 2(len)+2(postcode)+2(coords)+1(digit)=7 -> GOOD
        assert out.tolist() == ["GOOD", "POOR", "POOR", "POOR"]

    def test_fair_band(self):
        raw = pd.Series(["Mill Lane Liss"])  # len 14 -> +1, no digit, no pc
        out = _address_quality(raw, pd.Series([""]), pd.Series([False]))
        assert out.tolist() == ["POOR"]
        out = _address_quality(raw, pd.Series(["GU33"]), pd.Series([False]))
        assert out.tolist() == ["FAIR"]


class TestSimilarity:
    def test_exact(self):
        assert _token_jaccard("12 High St", "12 high st") == 1.0

    def test_jaccard(self):
        # A={12,HIGH,ST}, B={12,HIGH,ROAD}: m=2, total=3+3-2=4 -> 0.5
        assert _token_jaccard("12 High St", "12 High Road") == pytest.approx(0.5)

    def test_empty(self):
        assert _token_jaccard("", "") == 1.0


class TestEnhanceExport:
    def fixture(self):
        sources = rd.from_arrow(
            pa.table(
                {
                    "src_id": ["a", "b", "c", "d"],
                    "source_type": ["survey", "survey", "planning", "planning"],
                    "raw_address": [
                        "12 Monks Orchard Road, Alton GU34",
                        "7 Mill Lane, Liss",
                        "N A",
                        "99 Nowhere Street, Petersfield",
                    ],
                    "postcode_text": ["GU34 1AA", None, None, None],
                    "easting": [470000.0, None, None, None],
                    "northing": [140000.0, None, None, None],
                }
            )
        )
        matches = rd.from_arrow(
            pa.table(
                {
                    "src_id": ["a", "b", "d"],
                    "matched_id": ["U1", "U2", ""],
                    "score": [0.95, 0.65, 0.0],
                    "decision": ["auto_accept", "review", "reject"],
                    "method": ["exact_key", "fuzzy", "none"],
                }
            )
        )
        gaz = rd.from_arrow(
            pa.table(
                {
                    "uprn": ["U1", "U2"],
                    "full_address": [
                        "12 Monks Orchard Road Alton",
                        "7 Mill Lane Liss Hampshire",
                    ],
                    "easting": [470003.0, 510000.0],
                    "northing": [140004.0, 150000.0],
                }
            )
        )
        return sources, matches, gaz

    def test_derived_columns(self, ray_session):
        sources, matches, gaz = self.fixture()
        out = enhance_matches(
            sources, matches, gaz,
            postcode_col="postcode_text", easting_col="easting", northing_col="northing",
            gaz_easting="easting", gaz_northing="northing",
        ).to_pandas().set_index("src_id")

        assert out.loc["a", "match_status"] == "MATCHED"
        assert out.loc["b", "match_status"] == "NEEDS_REVIEW"  # 0.65 < 0.70
        assert out.loc["c", "match_status"] == "UNMATCHED"
        assert out.loc["d", "match_status"] == "UNMATCHED"  # empty matched_id
        assert out.loc["a", "address_quality"] == "GOOD"
        assert out.loc["c", "address_quality"] == "POOR"
        # 3-4-5 triangle: distance = 5.0
        assert out.loc["a", "coordinate_distance"] == pytest.approx(5.0)
        assert pd.isna(out.loc["b", "coordinate_distance"])
        assert out.loc["a", "address_similarity"] > 0.5
        assert pd.isna(out.loc["c", "address_similarity"])

    def test_per_type_csv_split(self, ray_session, tmp_path):
        sources, matches, gaz = self.fixture()
        enhanced = enhance_matches(
            sources, matches, gaz,
            postcode_col="postcode_text", easting_col="easting", northing_col="northing",
            gaz_easting="easting", gaz_northing="northing",
        )
        counts = export_enhanced_csvs(enhanced, str(tmp_path))
        assert counts == {"planning": 2, "survey": 2}
        for t in ("planning", "survey"):
            files = glob.glob(os.path.join(str(tmp_path), f"enhanced_{t}_results.csv", "*"))
            assert files
            df = pd.concat([pd.read_csv(f) for f in files])
            assert len(df) == counts[t]
            assert "address_quality" in df.columns
