"""CSV / JSONL source ingest (S1/S2/S3) — positional mappers, parseDate /
parseFloat coercion, load-time canonicalization.

Reference parity targets: internal/import/common.go:40-152,
internal/import/sources.go:10-115.
"""

import json

import pyarrow as pa
import pytest

from ehdc_llpg_address_matching_ray.functions.normalize import canonical_address
from ehdc_llpg_address_matching_ray.sources.ingest import (
    SOURCE_MAPPINGS,
    SRC_DOCUMENT_SCHEMA,
    coerce_source_batch,
    read_source_csv,
    read_source_jsonl,
)

_DN_ROWS = [
    # job, filepath, ref, raw addr, date, extra, doc type, uprn, e, n
    ["J1", "p/a.pdf", "APP/1", " 4 Monks Orchard Rd, Alton GU34 1AA ",
     "02/01/2006", "x", "Decision", " 100012345.00 ", "471234.5", "129876.25"],
    ["J2", "p/b.pdf", "APP/2", "16 HIGH ST", "2/1/06", "x", "Refusal", "", "", "bad"],
    ["J3", "p/c.pdf", "APP/3", "FLAT 2, 9 MILL LANE", "2006-01-02", "x", "", "42", "1", "2"],
    ["J4", "p/d.pdf", "APP/4", "THE OLD FORGE", "31/11/2019", "x", "D", "7", "", ""],
]


def _dn_table() -> pa.Table:
    cols = list(zip(*_DN_ROWS))
    return pa.table({f"c{i}": pa.array(list(c), pa.string()) for i, c in enumerate(cols)})


class TestCoerceBatch:
    def test_decision_notices_positional(self):
        out = coerce_source_batch(_dn_table(), "decision_notices")
        assert out.schema == SRC_DOCUMENT_SCHEMA
        d = out.to_pydict()
        assert d["source_type"] == ["decision_notices"] * 4
        assert d["job_number"] == ["J1", "J2", "J3", "J4"]
        assert d["doc_type"] == ["Decision", "Refusal", "", "D"]
        # trim (common.go: strings.TrimSpace on every field)
        assert d["uprn_raw"] == ["100012345.00", "", "42", "7"]
        # parseDate: all five Go layouts; impossible date (31/11) -> NULL
        dates = [str(v)[:10] if v is not None else None for v in d["doc_date"]]
        assert dates == ["2006-01-02", "2006-01-02", "2006-01-02", None]
        # parseFloat: empty and non-numeric -> NULL
        assert d["easting_raw"] == [471234.5, None, 1.0, None]
        assert d["northing_raw"] == [129876.25, None, 2.0, None]
        # load-time canonicalization matches the scalar M1 path
        want_can, want_pc, _ = canonical_address(_DN_ROWS[0][3])
        assert d["addr_can"][0] == want_can
        assert d["postcode_text"][0] == want_pc == "GU341AA"

    def test_agreements_external_ref_from_filepath(self):
        rows = [["J9", r"scans\2019\deed 42.pdf", "1 PARK RD", "02/01/06", "5", "", ""],
                ["J9", "plain.pdf", "2 PARK RD", "", "6", "3.5", "4.5"]]
        cols = list(zip(*rows))
        tbl = pa.table({f"c{i}": pa.array(list(c), pa.string()) for i, c in enumerate(cols)})
        d = coerce_source_batch(tbl, "agreements").to_pydict()
        # sources.go:84 extractFilenameFromPath — both separators, bare name kept
        assert d["external_ref"] == ["deed 42.pdf", "plain.pdf"]
        assert d["raw_address"] == ["1 PARK RD", "2 PARK RD"]
        assert d["doc_date"][1] is None

    def test_all_mappings_produce_schema(self):
        for st, mapping in SOURCE_MAPPINGS.items():
            width = max(mapping.values()) + 1
            tbl = pa.table({f"c{i}": pa.array(["x"], pa.string()) for i in range(width)})
            out = coerce_source_batch(tbl, st)
            assert out.schema == SRC_DOCUMENT_SCHEMA and len(out) == 1

    def test_unknown_source_rejected(self, tmp_path):
        (tmp_path / "x.csv").write_text("a,b\n1,2\n")
        with pytest.raises(ValueError):
            read_source_csv(str(tmp_path / "x.csv"), "nope")


class TestReadSources:
    def test_csv_roundtrip(self, ray_session, tmp_path):
        hdr = "Job Number,Filepath,Planning Application Number,Adress,Date,Extra,Document Type,UPRN,Easting,Northing"
        lines = [hdr] + [",".join(f'"{v}"' for v in r) for r in _DN_ROWS]
        # one malformed short row: skipped, not fatal (common.go:79-90)
        lines.insert(3, '"broken","row"')
        f = tmp_path / "dn.csv"
        f.write_text("\n".join(lines) + "\n")

        out = read_source_csv(str(f), "decision_notices").to_pandas()
        assert len(out) == 4  # malformed row dropped
        assert list(out.columns) == [n.name for n in SRC_DOCUMENT_SCHEMA]
        assert out["job_number"].tolist() == ["J1", "J2", "J3", "J4"]
        assert out["postcode_text"].tolist()[0] == "GU341AA"

    def test_jsonl_by_name(self, ray_session, tmp_path):
        recs = [
            {"job_number": "J1", "filepath": "p/a.pdf", "external_ref": "LC1",
             "raw_address": "4 Monks Orchard Road", "uprn_raw": "9", "easting_raw": "1.5",
             "northing_raw": ""},
            {"job_number": "J2", "filepath": "p/b.pdf", "external_ref": "LC2",
             "raw_address": "16 High Street, Alton", "uprn_raw": "", "easting_raw": "x",
             "northing_raw": "2"},
        ]
        f = tmp_path / "lc.jsonl"
        f.write_text("\n".join(json.dumps(r) for r in recs) + "\n")

        out = read_source_jsonl(str(f), "land_charges").to_pandas()
        assert out["source_type"].tolist() == ["land_charges"] * 2
        assert out["addr_can"].tolist()[0] == canonical_address("4 Monks Orchard Road")[0]
        import pandas as pd

        e = out["easting_raw"].tolist()
        assert e[0] == 1.5 and pd.isna(e[1])


class TestDateParserProperty:
    def test_valid_dates_roundtrip(self):
        """Property: every real calendar date rendered in any of the Go
        layouts parses back to exactly that date; impossible calendar
        dates never parse."""
        import datetime as dt

        import pyarrow as pa
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from ehdc_llpg_address_matching_ray.sources.ingest import _parse_dates

        @settings(max_examples=200, deadline=None)
        @given(
            st.dates(min_value=dt.date(1970, 1, 1), max_value=dt.date(2068, 12, 31)),
            st.sampled_from(["dmy_pad", "dmy", "dmy2", "iso"]),
        )
        def check(d, layout):
            if layout == "dmy_pad":
                s = f"{d.day:02d}/{d.month:02d}/{d.year}"
            elif layout == "dmy":
                s = f"{d.day}/{d.month}/{d.year}"
            elif layout == "dmy2":
                # 2-digit years are only unambiguous inside the Go pivot
                # window 1969-2068
                s = f"{d.day:02d}/{d.month:02d}/{d.year % 100:02d}"
            else:
                s = d.isoformat()
            out = _parse_dates(pa.array([s], pa.string()))
            got = out[0].as_py()
            assert got is not None and got.date() == d, (s, got)

        check()

    def test_impossible_dates_rejected(self):
        import pyarrow as pa

        from ehdc_llpg_address_matching_ray.sources.ingest import _parse_dates

        bad = ["31/02/2020", "31/11/2019", "00/01/2020", "12/13/2020",
               "2020-02-30", "32/01/2020", "1/1/1", "", "yesterday"]
        out = _parse_dates(pa.array(bad, pa.string()))
        assert all(v is None for v in out.to_pylist())
