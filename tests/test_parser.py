"""M7 AddressParser port tests — ported from
internal/validation/validator_test.go:261-430.

NOTE on fidelity: the reference's own TestAddressParser_ComponentExtraction
expects house numbers like "UNIT 2" / "FLAT A", but parser.go's
normalizeUnitNumber/normalizeFlatNumber (parser.go:482-500) strip the
prefix and return "2" / "A" — the Go table cannot pass against the Go
code.  This port pins the CODE's behavior (the production path) and
records the aspirational values in comments.
"""

from __future__ import annotations

import pytest

from ehdc_llpg_address_matching_ray.functions import parser as P


class TestComponentExtraction:
    def test_simple_residential(self):
        c = P.parse_address("168 Station Road, Liss, GU33 7AA")
        assert c.house_number == "168"
        assert c.street == "STATION ROAD"
        assert c.postcode == "GU33 7AA"
        assert c.locality == "LISS"
        assert c.is_valid_for_matching

    def test_unit_address(self):
        # reference test table expects "UNIT 2"; parser.go:482-489 strips
        # to the number — we pin the code behavior
        c = P.parse_address("Unit 2, Amey Industrial Estate, Frenchmans Road, Petersfield")
        assert c.house_number == "2"
        assert c.sub_building.upper().startswith("UNIT")
        assert "INDUSTRIAL ESTATE" in c.street
        assert c.postcode == ""

    def test_abbreviated_address(self):
        c = P.parse_address("168 Station Rd, Liss, Hants")
        assert c.house_number == "168"
        assert c.street == "STATION ROAD"  # RD -> ROAD expansion
        # HANTS -> HAMPSHIRE county expansion feeds the locality side
        assert "HAMPSHIRE" in (c.locality + c.street)

    def test_flat_address(self):
        # reference table expects "FLAT A"; normalizeFlatNumber returns "A"
        c = P.parse_address("Flat A, 123 High Street, Alton, GU34 1AA")
        assert c.house_number == "A"
        assert c.sub_building.upper().startswith("FLAT")
        assert "HIGH STREET" in c.street
        assert c.postcode == "GU34 1AA"

    def test_empty_address(self):
        c = P.parse_address("")
        assert c.extraction_method == "empty"
        assert not c.is_valid_for_matching
        assert "Empty address" in c.validation_issues


class TestValidateForMatching:
    def test_valid_complete_address(self):
        v = P.validate_address_for_matching("168 Station Road, Liss, GU33 7AA")
        assert v.suitable
        assert v.score > 0.6

    def test_missing_house_number(self):
        v = P.validate_address_for_matching("Station Road, Liss, GU33 7AA")
        assert not v.suitable
        assert any("house number" in i.lower() for i in v.issues)

    def test_vague_land_at(self):
        v = P.validate_address_for_matching("Land at Station Road, Liss")
        assert not v.suitable
        assert any("LAND AT" in i for i in v.issues)

    def test_vague_rear_of(self):
        v = P.validate_address_for_matching("Rear of 123 High Street, Alton")
        assert not v.suitable
        assert any("REAR OF" in i for i in v.issues)


class TestHelpers:
    def test_valid_house_numbers(self):
        # parser.go:308-314 pattern table
        for hn in ["123", "45A", "UNIT 2", "Flat A", "SUITE 10B", "12-14", "5A/3"]:
            assert P.is_valid_house_number(hn), hn
        for hn in ["", "ABC", "THE HOUSE"]:
            assert not P.is_valid_house_number(hn), hn

    def test_uk_postcode_validation(self):
        for pc_ in ["M1 1AA", "M60 1NW", "CR0 2YR", "DN55 1PT", "W1A 0AX", "EC1A 1BB", "GU33 7AA"]:
            assert P.is_valid_uk_postcode(pc_), pc_
        for pc_ in ["", "12345", "GU33", "ABCD EFG"]:
            assert not P.is_valid_uk_postcode(pc_), pc_

    def test_normalize_postcode(self):
        assert P.normalize_postcode("gu337aa") == "GU33 7AA"
        assert P.normalize_postcode(" GU33  7AA ") == "GU33 7AA"

    def test_normalize_street_name(self):
        # unit/flat removal + abbreviation expansion (parser.go:408-437)
        assert P.normalize_street_name("Unit 2 Frenchmans Rd") == "FRENCHMANS ROAD"
        assert P.normalize_street_name("station rd") == "STATION ROAD"

    def test_looks_like_locality(self):
        assert P.looks_like_locality("Liss")
        assert P.looks_like_locality("Petersfield")
        assert P.looks_like_locality("Headley Down")  # suffix TON/HAM... 'HEADLEY'
        assert not P.looks_like_locality("Some Very Long Multi Word Name")


class TestMatchOneExplain:
    """Single-query explain API (cmd/matcher-v2/main.go:522-578,
    engine.go:320-337)."""

    def make_index(self):
        from ehdc_llpg_address_matching_ray.state import GazetteerIndex

        return GazetteerIndex(
            [
                ("U1", "12 Monks Orchard Road, Alton"),
                ("U2", "14 Monks Orchard Road, Alton"),
                ("U3", "7 Mill Lane, Liss"),
            ]
        )

    def test_exact_query_auto_accepts(self):
        idx = self.make_index()
        r = idx.match_one("12 Monks Orchard Rd, Alton")
        assert r["decision"] == "auto_accept"
        assert r["accepted_id"] == "U1"
        exp = r["explanation"]["top_candidate"]
        assert exp["final_score"] == 1.0
        assert exp["jaro_winkler_contribution"] + exp["token_set_contribution"] + exp[
            "tfidf_contribution"
        ] == 1.0

    def test_house_number_veto_blocks_auto_accept(self):
        idx = self.make_index()
        # different house number, same street: must not auto-accept U1/U2
        r = idx.match_one("16 Monks Orchard Road, Alton")
        assert r["decision"] != "auto_accept" or r["accepted_id"] == ""

    def test_no_candidates(self):
        idx = self.make_index()
        r = idx.match_one("zzz qqq completely unrelated text 999999")
        assert r["decision"] == "reject"
        assert r["candidate_count"] == 0


class TestParserStage:
    def test_component_columns(self, ray_session):
        import ray.data as rd
        import pyarrow as pa

        from ehdc_llpg_address_matching_ray.stages.parse import parse_components

        ds = rd.from_arrow(
            pa.table(
                {
                    "src_id": ["a", "b"],
                    "raw_address": [
                        "168 Station Road, Liss, GU33 7AA",
                        "Land at Mill Lane, Liss",
                    ],
                }
            )
        )
        out = parse_components(ds, concurrency=(1, 2)).to_pandas().set_index("src_id")
        assert out.loc["a", "parsed_house_number"] == "168"
        assert out.loc["a", "parsed_street"] == "STATION ROAD"
        assert out.loc["a", "parsed_postcode"] == "GU33 7AA"
        assert out.loc["a", "parsed_valid_for_matching"]
        assert out.loc["a", "parsed_street_key"] == "STATION ROAD"
        assert not out.loc["b", "parsed_house_number"]
