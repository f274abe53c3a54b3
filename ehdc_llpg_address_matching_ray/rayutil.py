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
    """Hash-partition so every key lands in exactly one block, optionally
    sorted by the keys within each block — the substrate for vectorized
    per-run group processing via ``map_batches(fn, batch_size=None)``.

    Implemented as a PACKED exchange rather than a bare
    ``repartition(keys=...)``: Ray 2.49's hash shuffle assigns partitions
    with a pure-Python ``hash(tuple(row))`` loop
    (ray/data/_internal/arrow_ops/transform_pyarrow.py:70, measured
    ~300k rows/s — a flat, width-independent tax on every keyed shuffle).
    Here each input block is partitioned VECTORIZED (polars ``hash_rows``,
    an xxhash — deterministic across processes) and each (block,
    partition) slice ships as ONE Arrow-IPC blob row, so Ray's per-row
    loop only ever sees blocks×partitions rows.  Every block emits a row
    for EVERY partition (zero-row slices included) so no partition is
    ever empty or schemaless downstream.
    """
    ensure_hash_shuffle()
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    key_list = list(keys)

    # pick __p sentinel values that Ray's stock partitioner
    # (hash(tuple(scalar)) % P) maps BIJECTIVELY onto the P shuffle
    # partitions: every output partition then receives exactly its packed
    # rows and none is ever empty/schemaless (pyarrow scalar hashes are
    # process-stable, verified; search terminates in O(P log P) expected)
    pvals: list[int | None] = [None] * num_partitions
    v = 0
    _scratch = []
    while any(x is None for x in pvals) and v < 64 * num_partitions + 1024:
        s = pa.array([v], pa.int64())[0]
        h = hash((s,)) % num_partitions
        if pvals[h] is None:
            pvals[h] = v
        v += 1
    if any(x is None for x in pvals):  # pathological hash clustering
        pvals = list(range(num_partitions))
    pval_arr = np.array(pvals, dtype=np.int64)

    def pack(b: pa.Table) -> pa.Table:
        import polars as pl

        n = b.num_rows
        if n == 0:
            order = np.empty(0, dtype=np.int64)
            bounds = np.zeros(num_partitions + 1, dtype=np.int64)
        else:
            h = pl.from_arrow(b.select(key_list)).hash_rows(seed=0).to_numpy()
            parts = (h % np.uint64(num_partitions)).astype(np.int64)
            order = np.argsort(parts, kind="stable")
            bounds = np.searchsorted(parts[order], np.arange(num_partitions + 1))
        ps = pval_arr
        blobs = []
        for p in range(num_partitions):
            sub = b.take(pa.array(order[bounds[p] : bounds[p + 1]]))
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, sub.schema) as w:
                w.write_table(sub)
            blobs.append(sink.getvalue().to_pybytes())
        return pa.table({"__p": pa.array(ps, pa.int64()), "__blob": pa.array(blobs, pa.large_binary())})

    def unpack(b: pa.Table) -> pa.Table:
        tables = []
        for blob in b["__blob"].to_pylist():
            with pa.ipc.open_stream(pa.BufferReader(blob)) as r:
                tables.append(r.read_all())
        if not tables:
            return pa.table({})
        out = pa.concat_tables(tables)
        if sort and out.num_rows:
            idx = pc.sort_indices(
                out.select(key_list), sort_keys=[(k, "ascending") for k in key_list]
            )
            out = out.take(idx)
        return out

    packed = ds.map_batches(pack, batch_format="pyarrow", batch_size=None)
    shuffled = packed.repartition(num_partitions, keys=["__p"], sort=False)
    return shuffled.map_batches(unpack, batch_format="pyarrow", batch_size=None)


def anti_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    right_key: str | None = None,
    num_partitions: int = 8,
    right_rows: int | None = None,
) -> rd.Dataset:
    """Left-anti join: rows of ``left`` whose ``key`` does NOT appear in
    ``right[right_key]`` — the J10 "still unmatched" pattern
    (internal/engine/matcher.go:150-160) as a distributed left_outer join +
    null filter, NOT a driver-side id set (which would materialize every
    matched id on the driver and rescan batches in Python at scale).

    ``right`` must be unique on ``right_key`` (or left rows duplicate).
    The marks side is repartitioned to <= its row count so no block is
    empty (Ray 2.49 hash-join breaks when a join input's first block is
    empty).
    """
    import pyarrow as pa

    right_key = right_key or key
    n = right_rows if right_rows is not None else right.count()
    if n == 0:
        return left
    marks = (
        right.map_batches(
            lambda b, rk=right_key, k=key: pa.table(
                {k: b[rk], "__aj_hit": pa.array([1] * b.num_rows, pa.int8())}
            ),
            batch_format="pyarrow",
        )
        .materialize()
        .repartition(max(1, min(num_partitions, n)))
        .materialize()
    )
    joined = left.join(marks, join_type="left_outer", num_partitions=num_partitions, on=(key,))

    def keep_misses(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = b.filter(pc.is_null(b["__aj_hit"]))
        return out.drop_columns(["__aj_hit"])

    return joined.map_batches(keep_misses, batch_format="pyarrow")


def cluster_cpus(default: int = 8) -> int:
    """Logical CPUs of the current Ray cluster (driver-side)."""
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        pass
    return default


import os


def default_partitions(n_rows: int | None = None) -> int:
    """Shuffle partition count.

    Keyed-shuffle parallelism equals the partition count (one aggregator
    actor per partition), but each partition costs actor startup — so the
    count must follow DATA VOLUME, not CPU count: 8 partitions beat 32 on
    a 62k-page corpus (startup-dominated) while larger corpora want more
    aggregators.  ~20k rows per partition balances the two on this node;
    multi-node deployments should target ~256 MB per partition.
    ``RAY_GRAFT_PARTITIONS`` overrides for experiments.
    """
    env = os.environ.get("RAY_GRAFT_PARTITIONS")
    if env:
        return int(env)
    if n_rows is None:
        return 8
    return min(32, max(8, n_rows // 20_000))


def wide_partitions(n_rows: int | None = None) -> int:
    """Partition count for COMPUTE-HEAVY keyed stages (pair enumeration
    inside blocking): unlike the narrow shuffles (decide, fact joins,
    where aggregator startup dominates and 8 partitions win), the
    per-partition work here is CPU-bound, so the partition count is the
    stage's parallelism ceiling — size it so a full-width cluster has
    one task per core at the target ~8k rows/partition."""
    env = os.environ.get("RAY_GRAFT_PARTITIONS")
    if env:
        return int(env)
    base = default_partitions(n_rows)
    if n_rows is None:
        return max(base, cluster_cpus())
    return min(64, max(base, n_rows // 8_000))


def default_concurrency() -> tuple[int, int]:
    """Actor-pool bounds for stateful map_batches stages: scale to the
    cluster instead of a fixed cap.  The floor is half the cluster —
    Ray's autoscaling pool otherwise starts at one actor and ramps too
    slowly for a stage to reach full parallelism before it drains."""
    cpus = cluster_cpus()
    # floor: ramp fast on big clusters; ceiling: leave ~2 CPUs of headroom
    # for hash-shuffle aggregator actors scheduled in the same graph (a
    # full-width pool starves them and deadlocks small clusters)
    return (max(1, cpus // 4), max(2, cpus - 2))
