"""G2 group fuzzy rescue + G7 historic-key creation tests."""

from __future__ import annotations

import pyarrow as pa
import pytest

import ray.data as rd

from ehdc_llpg_address_matching_ray.pipelines.rescue import create_historic_keys, group_rescue


class TestHistoricKeys:
    def test_anti_join_distinct(self, ray_session):
        sources = rd.from_arrow(
            pa.table(
                {
                    "legacy_uprn": ["100.00", "100", "200", None, "", "300.00"],
                    "raw_address": [
                        "12 High Street, Alton",
                        "12 High Street, Alton, Hampshire",
                        "3 Mill Lane, Liss",
                        "x",
                        "y",
                        "The Farm, Selborne",
                    ],
                }
            )
        )
        gaz = rd.from_arrow(pa.table({"uprn": ["200", "999"]}))
        out = create_historic_keys(sources, gaz).to_pandas().sort_values("uprn").reset_index(drop=True)
        # 100 (deduped, longest address wins) and 300 are missing; 200 exists
        assert out["uprn"].tolist() == ["100", "300"]
        assert out.loc[0, "full_address"] == "12 High Street, Alton, Hampshire"
        assert out["historic"].all()


class TestGroupRescue:
    def test_rescue_propagates_to_group(self, ray_session):
        # group g1: two members, no matches, one real address close to a
        # gazetteer row -> both members get the correction
        sources = rd.from_arrow(
            pa.table(
                {
                    "src_id": ["a", "b", "c"],
                    "raw_address": [
                        "12 Monks Orchard Road, Alton",
                        "F12345",  # planning ref, not a real address
                        "7 Mill Lane, Liss",  # group of 1: ineligible
                    ],
                    "group_key": ["g1", "g1", "g2"],
                }
            )
        )
        matches = rd.from_arrow(
            pa.table(
                {
                    "src_id": ["a", "b", "c"],
                    "score": [0.2, 0.0, 0.9],  # g1 poor, g2 already matched
                }
            )
        )
        gaz = rd.from_arrow(
            pa.table(
                {
                    "uprn": ["501", "502"],
                    "full_address": [
                        "12 Monks Orchard Road, Alton, GU34 1AA",
                        "99 Other Street, Bordon",
                    ],
                }
            )
        )
        out = group_rescue(sources, matches, gaz).to_pandas()
        assert set(out["src_id"]) == {"a", "b"}
        assert (out["corrected_id"] == "501").all()
        assert out["confidence"].iloc[0] in (0.65, 0.75, 0.85)

    def test_no_eligible_groups(self, ray_session):
        sources = rd.from_arrow(
            pa.table(
                {
                    "src_id": ["a", "b"],
                    "raw_address": ["12 High Street, Alton", "13 High Street, Alton"],
                    "group_key": ["g1", "g1"],
                }
            )
        )
        matches = rd.from_arrow(pa.table({"src_id": ["a", "b"], "score": [0.9, 0.8]}))
        gaz = rd.from_arrow(pa.table({"uprn": ["1"], "full_address": ["x"]}))
        out = group_rescue(sources, matches, gaz)
        assert out.count() == 0
