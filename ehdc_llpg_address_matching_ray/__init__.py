"""Ray-Data-native record-linkage / entity-resolution engine.

A from-scratch reimplementation of the query and data-processing
capabilities of SeamusWaldron/ehdc-llpg-address-matching (Go + PostgreSQL,
surveyed in /root/repo/SURVEY.md), re-expressed as idiomatic Ray Data
pipelines over Apache Arrow batches and re-targeted at web-scale corpora
of Common-Crawl-style pages ``(url, warc_ts, html, text, lang)``.

Essential dataflow (reference: ADDRESS_MATCHING_PROCESS.md:319-354):

    extract/normalize -> block (candidate generation) -> pairwise score
        -> decide -> transitive cluster -> consensus -> fact write

Every stage is a ``ray.data.Dataset`` transform: stateless
``map_batches`` over zero-copy Arrow for normalization and key emission,
``groupby`` shuffles for blocking / dedup / clustering, actor pools for
stateful scorers, ``write_parquet`` checkpoints with lineage manifests.

No module in this package calls ``ray.init()``: sessions are owned by
the caller (driver / bench.py / test fixture).
"""

__version__ = "0.1.0"
