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

# Select Ray Data's hash-shuffle strategy process-wide at import time:
# keyed repartition (the engine's group-processing substrate, see
# rayutil.py) requires it, and every Dataset lineage snapshots the
# DataContext at its ROOT's creation — so the flip must precede any
# dataset the engine will ever touch.  All group processing in this
# package goes through partition_by_key + vectorized pandas (never
# Dataset.groupby aggregates / map_groups, which cost ~1 ms/group and
# can hang under this strategy).
from .rayutil import ensure_hash_shuffle as _ensure_hash_shuffle

_ensure_hash_shuffle()
