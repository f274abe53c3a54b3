"""Ray Data execution-context helpers.

The engine's wide stages use **keyed repartition + vectorized in-block
processing** instead of ``Dataset.groupby(...).aggregate/map_groups``:
Ray's aggregate/map_groups path costs ~1 ms of Python per GROUP (measured
35k-group dedup: 115 s via aggregate, 1.9 s via repartition+pandas), which
is catastrophic when group count scales with the corpus (pair dedup,
exact dedup, per-source decisions, label propagation).  Hash-partitioning
co-locates each key in exactly one block; a plain ``map_batches`` with
``batch_size=None`` then processes whole partitions with C-speed
pandas/numpy groupbys.

``repartition(keys=...)`` requires the HASH_SHUFFLE strategy, which is
also Ray's direction of travel for joins/aggregates; we set it once,
process-wide, on first use.
"""

from __future__ import annotations

from contextlib import contextmanager

import ray.data as rd
from ray.data.context import DataContext, ShuffleStrategy


def ensure_hash_shuffle() -> None:
    ctx = DataContext.get_current()
    if ctx.shuffle_strategy != ShuffleStrategy.HASH_SHUFFLE:
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    # Aggregator actors of hash-shuffle operators otherwise reserve
    # min(1, CPUs/2/num_partitions) CPU each; a DAG with several
    # concurrent shuffle ops (repartition + chained joins) then reserves
    # more CPU than a small cluster has and deadlocks (observed at
    # num_cpus=4).  Pin the per-partition reservation to Ray's own
    # single-node default so shuffle actors multiplex instead of starving.
    for attr in (
        "hash_shuffle_operator_actor_num_cpus_per_partition_override",
        "hash_aggregate_operator_actor_num_cpus_per_partition_override",
        "join_operator_actor_num_cpus_per_partition_override",
    ):
        if getattr(ctx, attr, None) is None:
            setattr(ctx, attr, 0.0625)


@contextmanager
def hash_shuffle():
    """Scoped HASH_SHUFFLE strategy.

    Each Dataset snapshots the DataContext at CREATION, so the flip must
    surround dataset construction (not execution), and restoring on exit
    doesn't affect datasets already built — they carry their snapshot.
    Scoped (not global) because the plain sort-based strategy is faster
    for Ray's own groupby/map_groups paths with few groups, and
    map_groups was observed to hang under the hash strategy.
    """
    ctx = DataContext.get_current()
    prev = ctx.shuffle_strategy
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    try:
        yield
    finally:
        ctx.shuffle_strategy = prev


def partition_by_key(
    ds: rd.Dataset, keys: list[str], num_partitions: int, sort: bool = True
) -> rd.Dataset:
    """Hash-partition so every key lands in exactly one block, sorted by
    the keys within each block — the substrate for vectorized per-run
    group processing via ``map_batches(fn, batch_size=None)``."""
    ensure_hash_shuffle()
    return ds.repartition(num_partitions, keys=keys, sort=sort)
