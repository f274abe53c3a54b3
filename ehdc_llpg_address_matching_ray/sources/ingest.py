"""S1/S2/S3 — CSV / JSONL source-document ingest as Ray Data pipelines.

Reference: internal/import/common.go:40-115 (CSVImporter.ImportCSV — skip
header, per-record positional mapFunc, CanonicalAddress computed at load
time), internal/import/sources.go:10-99 (the four source mappers),
parseFloat / parseDate (common.go:118-152 — empty or unparseable values
become NULL, five accepted date layouts), extractFilenameFromPath
(sources.go:101-115).

Ray-Data-first shape: ``ray.data.read_csv`` / ``read_json`` streams file
shards through the object store; ONE vectorized ``map_batches`` coercion
stage per source does trim → date/float coercion → M1 canonicalization
(functions/normalize.py canonical_batch) in Arrow / pandas kernels.  No
driver loop touches rows; malformed CSV rows (wrong column count) are
skipped at the Arrow parser, mirroring the reference's ``errors++;
continue`` (common.go:79-90).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..functions.normalize import canonical_batch

# Positional field -> column-index maps, one per source type
# (internal/import/sources.go:10-99; decision notices' raw_address column
# is record[3] — the source file header spells it "Adress").
SOURCE_MAPPINGS: dict[str, dict[str, int]] = {
    "decision_notices": {
        "job_number": 0, "filepath": 1, "external_ref": 2, "raw_address": 3,
        "doc_date": 4, "doc_type": 6, "uprn_raw": 7, "easting_raw": 8,
        "northing_raw": 9,
    },
    "land_charges": {
        "job_number": 0, "filepath": 1, "external_ref": 2, "raw_address": 3,
        "uprn_raw": 4, "easting_raw": 5, "northing_raw": 6,
    },
    "enforcement_notices": {
        "job_number": 0, "filepath": 1, "external_ref": 2, "raw_address": 3,
        "doc_date": 4, "doc_type": 5, "uprn_raw": 6, "easting_raw": 7,
        "northing_raw": 8,
    },
    # agreements derive external_ref from the filepath basename
    # (sources.go:84, extractFilenameFromPath)
    "agreements": {
        "job_number": 0, "filepath": 1, "raw_address": 2, "doc_date": 3,
        "uprn_raw": 4, "easting_raw": 5, "northing_raw": 6,
    },
}

_STRING_FIELDS = ("source_type", "job_number", "filepath", "external_ref",
                  "doc_type", "raw_address", "addr_can", "postcode_text",
                  "uprn_raw")
_FLOAT_FIELDS = ("easting_raw", "northing_raw")

SRC_DOCUMENT_SCHEMA = pa.schema(
    [(f, pa.string()) for f in _STRING_FIELDS[:6]]
    + [("doc_date", pa.timestamp("s"))]
    + [(f, pa.string()) for f in _STRING_FIELDS[6:]]
    + [(f, pa.float64()) for f in _FLOAT_FIELDS]
)

# common.go:138-142: the five Go layouts are d/m/Y and d/m/y (padded or
# not) plus ISO.  C strptime is laxer than Go time.Parse (2-digit years
# match %Y; 31/11 normalizes to 01/12), so parse by regex extraction +
# round-trip validation instead of strptime-with-fallbacks.
_SLASH_RE = r"^(?P<d>\d{1,2})/(?P<m>\d{1,2})/(?P<y>\d{4}|\d{2})$"
_ISO_RE = r"^\d{4}-\d{2}-\d{2}$"


def _parse_dates(arr: pa.Array) -> pa.Array:
    """parseDate (common.go:130-152): try each layout, NULL if none fit."""
    g = pc.extract_regex(arr, _SLASH_RE)
    dd = pc.utf8_lpad(pc.struct_field(g, "d"), 2, "0")
    mm = pc.utf8_lpad(pc.struct_field(g, "m"), 2, "0")
    yy = pc.struct_field(g, "y")
    # Go's 2-digit-year pivot (time.Parse): 69-99 -> 19xx, 00-68 -> 20xx
    century = pc.if_else(
        pc.greater_equal(pc.cast(yy, pa.int32()), 69), "19", "20"
    )
    y4 = pc.if_else(
        pc.equal(pc.utf8_length(yy), 2),
        pc.binary_join_element_wise(century, yy, ""),
        yy,
    )
    iso_from_slash = pc.binary_join_element_wise(y4, mm, dd, "-")
    iso_direct = pc.if_else(pc.match_substring_regex(arr, _ISO_RE), arr, None)
    cand = pc.coalesce(iso_from_slash, iso_direct)
    ts = pc.strptime(cand, format="%Y-%m-%d", unit="s", error_is_null=True)
    # round-trip rejects overflow dates strptime silently normalizes
    valid = pc.equal(pc.strftime(ts, format="%Y-%m-%d"), cand)
    return pc.if_else(pc.fill_null(valid, False), ts, None).cast(pa.timestamp("s"))


def _parse_floats(arr: pa.Array) -> pa.Array:
    """parseFloat (common.go:118-128): empty / non-numeric -> NULL."""
    import pandas as pd

    vals = pd.to_numeric(pd.Series(arr.to_pylist(), dtype=object), errors="coerce")
    return pa.array(vals, type=pa.float64(), from_pandas=True)


def _basename(arr: pa.Array) -> pa.Array:
    """extractFilenameFromPath (sources.go:101-115): both separators."""
    return pc.replace_substring_regex(arr, r"^.*[/\\]", "")


def coerce_source_batch(tbl: pa.Table, source_type: str,
                        positional: bool = True) -> pa.Table:
    """Vectorized mapFunc + CanonicalAddress for one batch.

    ``positional=True`` reads columns by index (CSV, header already
    skipped); ``positional=False`` reads by field name (JSONL).
    """
    mapping = SOURCE_MAPPINGS[source_type]
    n = len(tbl)

    def col(field: str) -> pa.Array | None:
        if positional:
            idx = mapping.get(field)
            if idx is None or idx >= tbl.num_columns:
                return None
            raw = tbl.column(idx)
        else:
            if field not in tbl.column_names:
                return None
            raw = tbl[field]
        arr = raw.combine_chunks() if isinstance(raw, pa.ChunkedArray) else raw
        return pc.utf8_trim_whitespace(pc.cast(arr, pa.string()))

    out: dict[str, pa.Array] = {
        "source_type": pa.array([source_type] * n, pa.string())
    }
    for f in ("job_number", "filepath", "external_ref", "doc_type"):
        c = col(f)
        if f == "external_ref" and c is None and source_type == "agreements":
            fp = col("filepath")
            c = _basename(fp) if fp is not None else None
        out[f] = c if c is not None else pa.nulls(n, pa.string())

    dd = col("doc_date")
    out["doc_date"] = _parse_dates(dd) if dd is not None else pa.nulls(n, pa.timestamp("s"))

    raw_addr = col("raw_address")
    if raw_addr is None:
        raw_addr = pa.array([""] * n, pa.string())
    out["raw_address"] = raw_addr
    addr_can, postcode = canonical_batch(raw_addr)
    out["addr_can"] = addr_can
    out["postcode_text"] = postcode

    u = col("uprn_raw")
    out["uprn_raw"] = u if u is not None else pa.nulls(n, pa.string())

    for f in _FLOAT_FIELDS:
        c = col(f)
        out[f] = _parse_floats(c) if c is not None else pa.nulls(n, pa.float64())

    return pa.table({f.name: out[f.name] for f in SRC_DOCUMENT_SCHEMA}).cast(
        SRC_DOCUMENT_SCHEMA
    )


def _sniff_ncols(path: str) -> int:
    """Column count from the first file's header line (headers in the
    reference's inputs are unquoted simple names)."""
    import csv as _csv
    import os

    if os.path.isdir(path):
        entries = sorted(
            os.path.join(path, e) for e in os.listdir(path)
            if e.lower().endswith(".csv")
        )
        path = entries[0]
    with open(path, newline="", encoding="utf-8", errors="replace") as fh:
        return len(next(_csv.reader(fh)))


def read_source_csv(path: str, source_type: str, **read_kwargs) -> rd.Dataset:
    """Stream one source's CSV file(s) into the src_document schema.

    All columns parse as strings under positional names (header row
    skipped, as ImportCSV does at common.go:52-56); inconsistent-width
    rows are skipped, not fatal (common.go:79-90).
    """
    from pyarrow import csv as pacsv

    if source_type not in SOURCE_MAPPINGS:
        raise ValueError(f"unknown source_type {source_type!r}; "
                         f"one of {sorted(SOURCE_MAPPINGS)}")
    ncols = _sniff_ncols(path)
    names = [f"c{i}" for i in range(ncols)]
    ds = rd.read_csv(
        path,
        read_options=pacsv.ReadOptions(column_names=names, skip_rows=1),
        parse_options=pacsv.ParseOptions(
            invalid_row_handler=lambda row: "skip"
        ),
        convert_options=pacsv.ConvertOptions(
            column_types={c: pa.string() for c in names}
        ),
        **read_kwargs,
    )
    return ds.map_batches(
        lambda b: coerce_source_batch(b, source_type, positional=True),
        batch_format="pyarrow",
    )


def read_source_jsonl(path: str, source_type: str, **read_kwargs) -> rd.Dataset:
    """JSONL twin of :func:`read_source_csv` — fields matched by name
    (job_number, filepath, raw_address, ...) instead of position."""
    if source_type not in SOURCE_MAPPINGS:
        raise ValueError(f"unknown source_type {source_type!r}; "
                         f"one of {sorted(SOURCE_MAPPINGS)}")
    ds = rd.read_json(path, **read_kwargs)
    return ds.map_batches(
        lambda b: coerce_source_batch(b, source_type, positional=False),
        batch_format="pyarrow",
    )
