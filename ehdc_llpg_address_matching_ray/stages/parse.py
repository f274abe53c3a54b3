"""M13 — structured-parser actor stage (gopostal-style component columns).

Reference: cmd/gopostal-real/main.go:12-90 runs every address through
libpostal and stores ``gopostal_*`` component columns that the
component-equality blocking (J5) and the component engine (M6/P4) read.
libpostal is unavailable offline, so the parser is the full M7 port
(functions/parser.py — the reference's own regex fallback,
parser.go:91-181 "TODO: integrate with gopostal"); the Ray plumbing is
the real production shape: a callable-class actor pool, patterns
compiled once per process, one output column per component.

Output columns (prefix configurable, default ``parsed_``):
  house_number, street, locality, postcode, confidence (float64),
  valid_for_matching (bool) — plus a ``street_key`` normalized-street
  blocking key for J5 joins.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from ..functions import parser as P


class ParserStage:
    """map_batches actor: text column -> component columns."""

    def __init__(self, text_col: str = "raw_address", prefix: str = "parsed_"):
        self.text_col = text_col
        self.prefix = prefix

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        house, street, locality, postcode, conf, valid, skey = [], [], [], [], [], [], []
        for t in texts:
            c = P.parse_address(t or "")
            house.append(c.house_number)
            street.append(c.street)
            locality.append(c.locality)
            postcode.append(c.postcode)
            conf.append(c.extraction_confidence)
            valid.append(c.is_valid_for_matching)
            skey.append(P.normalize_street_name(c.street) if c.street else "")
        p = self.prefix
        cols = {name: batch[name] for name in batch.column_names}
        cols[p + "house_number"] = pa.array(house, pa.string())
        cols[p + "street"] = pa.array(street, pa.string())
        cols[p + "locality"] = pa.array(locality, pa.string())
        cols[p + "postcode"] = pa.array(postcode, pa.string())
        cols[p + "confidence"] = pa.array(conf, pa.float64())
        cols[p + "valid_for_matching"] = pa.array(valid, pa.bool_())
        cols[p + "street_key"] = pa.array(skey, pa.string())
        return pa.table(cols)


def parse_components(
    ds: rd.Dataset,
    text_col: str = "raw_address",
    prefix: str = "parsed_",
    concurrency=(1, 8),
    batch_size: int = 4096,
) -> rd.Dataset:
    """Dataset + text column -> Dataset with parsed component columns.

    The ``parsed_street_key``/``parsed_postcode`` columns are J5
    component-equality block keys: join or repartition on them to
    co-locate candidates that share a normalized street or postcode
    (engine_components_fixed.go:201-241)."""
    return ds.map_batches(
        ParserStage,
        fn_constructor_args=(text_col, prefix),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
