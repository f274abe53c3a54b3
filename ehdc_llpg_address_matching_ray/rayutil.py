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


def _exchange_mode() -> str:
    """Keyed-exchange implementation: ``tasks`` (default) = raw-task
    map-reduce shuffle; ``packed`` = Arrow-IPC blobs through Ray Data's
    hash shuffle.  RAY_GRAFT_EXCHANGE overrides."""
    import os as _os

    return _os.environ.get("RAY_GRAFT_EXCHANGE", "tasks")


def _hash_partition_block(block, key_list: list[str], P: int):
    """Vectorized partition assignment for one Arrow block: polars
    ``hash_rows`` (xxhash — deterministic across processes) % P, rows
    stably reordered so each partition is one contiguous slice."""
    import numpy as np
    import polars as pl
    import pyarrow as pa

    n = block.num_rows
    if n == 0:
        return [block] * 0, None
    h = pl.from_arrow(block.select(key_list)).hash_rows(seed=0).to_numpy()
    parts = (h % np.uint64(P)).astype(np.int64)
    order = np.argsort(parts, kind="stable")
    bounds = np.searchsorted(parts[order], np.arange(P + 1))
    ordered = block.take(pa.array(order))
    return ordered, bounds


def _task_pack(key_list: list[str], P: int, *blocks):
    """Partition a GROUP of blocks (concatenated) into P contiguous
    slices.  Grouping upstream blocks into one pack task is what bounds
    the exchange's object count: refs = packs x P with packs ~ 2 x CPUs,
    independent of how finely the producing stage blocked its output
    (a map stage emitting thousands of small blocks would otherwise cost
    thousands x P refs and melt driver scheduling — measured 43x
    slowdown on a 100M-row exchange)."""
    import pandas as pd
    import pyarrow as pa

    # map_batches skips its UDF on empty blocks, so a pandas-block
    # producer can leak raw DataFrames through a pyarrow-format stage
    # (observed: empty partitions of a pandas _grouped feeding a union);
    # normalize here so every exchange tolerates them
    blocks = tuple(
        pa.Table.from_pandas(b, preserve_index=False) if isinstance(b, pd.DataFrame) else b
        for b in blocks
    )
    live = [b for b in blocks if b.num_rows]
    if not live:
        typed = next((b for b in blocks if b.num_columns), blocks[0])
        out = [typed.slice(0, 0)] * P
        return out[0] if P == 1 else tuple(out)
    block = live[0] if len(live) == 1 else pa.concat_tables(live, promote_options="default")
    ordered, bounds = _hash_partition_block(block, key_list, P)
    out = [ordered.slice(bounds[p], bounds[p + 1] - bounds[p]) for p in range(P)]
    return out[0] if P == 1 else tuple(out)


def _group_refs(refs: list, target_groups: int) -> list[list]:
    """Chunk block refs into at most ``target_groups`` contiguous groups
    (one pack task each)."""
    k = max(1, -(-len(refs) // max(1, target_groups)))
    return [refs[i : i + k] for i in range(0, len(refs), k)]


def _task_merge(key_list: list[str], sort: bool, apply_fn, *parts):
    import pyarrow as pa
    import pyarrow.compute as pc

    tables = [t for t in parts if t.num_rows]
    if not tables:
        out = parts[0].slice(0, 0)
        return apply_fn(out) if apply_fn is not None else out
    out = pa.concat_tables(tables)
    if sort:
        idx = pc.sort_indices(
            out.select(key_list), sort_keys=[(k, "ascending") for k in key_list]
        )
        out = out.take(idx)
    # fused per-partition transform: saves a whole extra task round (and
    # its materialization barrier) vs a downstream map_batches
    return apply_fn(out) if apply_fn is not None else out


def _partition_by_key_tasks(
    ds: rd.Dataset, key_list: list[str], num_partitions: int, sort: bool, apply_fn=None
) -> rd.Dataset:
    """Raw-task map-reduce exchange (the classic Ray shuffle): one pack
    task per input block returning ``P`` slice objects, one merge task
    per partition.  Tasks run on Ray's long-lived warm workers — unlike
    Ray Data's hash-shuffle operator, which spawns a fresh aggregator
    ACTOR (process + package import) per partition per shuffle op: with
    several keyed exchanges per pipeline those spawns were the dominant
    width-independent floor.  The driver coordinates only O(blocks × P)
    object refs — metadata, never data.

    Scale note: object count is packs × P with packs capped at ~2 × CPUs
    (input blocks are grouped per pack task), so the ref count stays
    bounded no matter how finely the producer blocked its output.  At
    multi-node 100-TB scale prefer ``RAY_GRAFT_EXCHANGE=packed``
    (streaming hash shuffle with IPC-packed rows) once packs × P
    approaches object-store metadata limits; the semantics and hash
    function are identical.
    """
    import ray

    mat = ds.materialize()
    refs = mat.to_arrow_refs()
    P = num_partitions
    if not refs or P <= 0:
        if apply_fn is not None:
            return mat.map_batches(apply_fn, batch_format="pyarrow", batch_size=None)
        return mat
    pack = ray.remote(_task_pack)
    merge = ray.remote(_task_merge)
    groups = _group_refs(refs, 2 * cluster_cpus())
    if P == 1:
        outs = [
            merge.remote(
                key_list, sort, apply_fn, *[pack.remote(key_list, 1, *g) for g in groups]
            )
        ]
    else:
        packs = [pack.options(num_returns=P).remote(key_list, P, *g) for g in groups]
        outs = [
            merge.remote(key_list, sort, apply_fn, *[packs[i][p] for i in range(len(groups))])
            for p in range(P)
        ]
    return rd.from_arrow_refs(outs)


def _task_join_merge(on: list[str], how: str, n_left: int, *parts):
    """Join one co-partition: concat the left / right slices and join
    vectorized via polars (single-threaded; parallelism is one task per
    partition).  Empty sides still produce the correct joined schema."""
    import polars as pl
    import pyarrow as pa

    def _side(side_parts):
        live = [t for t in side_parts if t.num_rows]
        if live:
            return pa.concat_tables(live)
        # all-empty partition: prefer a typed empty (blocks emitted by
        # empty map outputs can be SCHEMALESS pa.table({}) — useless as
        # a schema carrier)
        for t in side_parts:
            if t.num_columns:
                return t.slice(0, 0)
        return side_parts[0]

    left = _side(parts[:n_left])
    right = _side(parts[n_left:])
    if left.num_columns == 0 or right.num_columns == 0:
        # a schemaless side cannot be joined; inner/anti semantics give
        # the only sensible typed results
        return left if how == "anti" else left.slice(0, 0)
    how_pl = {"inner": "inner", "left_outer": "left", "anti": "anti"}[how]
    out = pl.from_arrow(left).join(pl.from_arrow(right), on=on, how=how_pl).to_arrow()
    # cast back to the input Arrow types: the polars roundtrip rewrites
    # string -> large_string, which breaks type-strict downstream
    # consumers (acero joins refuse mixed string/large_string keys)
    types = {f.name: f.type for f in right.schema}
    types.update({f.name: f.type for f in left.schema})
    cols = []
    fields = []
    for name in out.column_names:
        col = out[name]
        want = types.get(name)
        if want is not None and col.type != want:
            col = col.cast(want)
        cols.append(col)
        fields.append(pa.field(name, col.type))
    return pa.Table.from_arrays([c.combine_chunks() for c in cols], schema=pa.schema(fields))


def task_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: tuple | list,
    how: str = "inner",
    num_partitions: int = 8,
) -> rd.Dataset:
    """Distributed hash join as raw tasks on warm workers: co-partition
    both sides with the same xxhash (one pack task per block), then one
    polars join task per partition.  Replaces ``Dataset.join`` where the
    join sits on the pipeline's critical path: Ray 2.49's join operator
    spawns a fresh aggregator-actor pool per op (width-independent
    process-spawn floor) and partitions rows with a per-row Python hash
    loop.  Join keys must share names on both sides (rename first).

    ``how``: inner | left_outer | anti (anti = rows of ``left`` with no
    key match in ``right`` — the J10 pattern).  Same scale note as
    _partition_by_key_tasks: object count is blocks × P.
    """
    import ray

    on = list(on)
    P = max(1, num_partitions)
    lrefs = left.materialize().to_arrow_refs()
    rrefs = right.materialize().to_arrow_refs()
    pack = ray.remote(_task_pack)
    join = ray.remote(_task_join_merge)
    if not lrefs or not rrefs:
        # a side with ZERO blocks (not even a typed empty) can't convey
        # its schema to the join tasks
        if how == "anti":
            return left  # empty right excludes nothing; empty left is empty
        ensure_hash_shuffle()
        return left.join(right, join_type=how, num_partitions=P, on=tuple(on))
    lgroups = _group_refs(lrefs, 2 * cluster_cpus())
    rgroups = _group_refs(rrefs, 2 * cluster_cpus())
    if P == 1:
        lcol = [pack.remote(on, 1, *g) for g in lgroups]
        rcol = [pack.remote(on, 1, *g) for g in rgroups]
        outs = [join.remote(on, how, len(lcol), *lcol, *rcol)]
    else:
        lp = [pack.options(num_returns=P).remote(on, P, *g) for g in lgroups]
        rp = [pack.options(num_returns=P).remote(on, P, *g) for g in rgroups]
        outs = [
            join.remote(
                on,
                how,
                len(lgroups),
                *[lp[i][p] for i in range(len(lgroups))],
                *[rp[j][p] for j in range(len(rgroups))],
            )
            for p in range(P)
        ]
    return rd.from_arrow_refs(outs)


def cast_like(out, *reference_tables):
    """Cast ``out``'s columns back to the types the reference tables
    carry (polars joins rewrite string -> large_string, which breaks
    type-strict downstream consumers)."""
    import pyarrow as pa

    types: dict = {}
    for ref in reference_tables:
        types.update({f.name: f.type for f in ref.schema})
    cols = []
    fields = []
    for name in out.column_names:
        col = out[name]
        want = types.get(name)
        if want is not None and col.type != want:
            col = col.cast(want)
        cols.append(col)
        fields.append(pa.field(name, col.type))
    return pa.Table.from_arrays([c.combine_chunks() for c in cols], schema=pa.schema(fields))


def _co_apply(fn, counts, *parts):
    """Run ``fn`` over ONE co-partition: ``parts`` holds each side's
    packed slices side-major (``counts[i]`` tables for side ``i``); fn
    receives one concatenated, typed-empty-aware table per side."""
    import pyarrow as pa

    sides = []
    k = 0
    for c in counts:
        group = parts[k : k + c]
        k += c
        live = [t for t in group if t.num_rows]
        if live:
            sides.append(
                live[0] if len(live) == 1 else pa.concat_tables(live, promote_options="default")
            )
        else:
            typed = next((t for t in group if t.num_columns), group[0] if group else pa.table({}))
            sides.append(typed.slice(0, 0))
    return fn(*sides)


def co_partition_apply(
    sides: list[rd.Dataset],
    key_lists: list[list[str]],
    num_partitions: int,
    fn,
) -> rd.Dataset:
    """Hash co-partition several datasets in ONE pack round (equal key
    VALUES land in the same partition — same xxhash as partition_by_key /
    task_join, so key columns must have identical types across sides),
    then run ``fn(side0_table, side1_table, ...) -> Table`` once per
    partition in a single task round.

    This fuses what would otherwise be a CHAIN of joins/groupbys — each
    its own exchange, materialization barrier and task round — into one
    exchange + one apply round.  The fact build's rep-level enrichment
    (two joins + a partial-aggregate merge) is one call; its serialized
    form measured ~5 s of width-independent barrier floor at 16 CPUs.
    ``fn`` must be a plain picklable function and must tolerate
    typed-empty (zero-row) sides."""
    import ray

    P = max(1, num_partitions)
    pack = ray.remote(_task_pack)
    apply = ray.remote(_co_apply)
    packed: list[list] = []  # per side: per pack-group, P-tuple of refs (or single ref)
    counts: list[int] = []
    for ds, keys in zip(sides, key_lists):
        refs = ds.materialize().to_arrow_refs()
        groups = _group_refs(refs, 2 * cluster_cpus()) if refs else []
        counts.append(len(groups))
        if P == 1:
            packed.append([[pack.remote(list(keys), 1, *g)] for g in groups])
        else:
            packed.append([pack.options(num_returns=P).remote(list(keys), P, *g) for g in groups])
    outs = []
    for p in range(P):
        parts = []
        for s in range(len(sides)):
            if P == 1:
                parts.extend(packed[s][i][0] for i in range(counts[s]))
            else:
                parts.extend(packed[s][i][p] for i in range(counts[s]))
        outs.append(apply.remote(fn, counts, *parts))
    return rd.from_arrow_refs(outs)


def partition_by_key(
    ds: rd.Dataset, keys: list[str], num_partitions: int, sort: bool = True, apply_fn=None
) -> rd.Dataset:
    """Hash-partition so every key lands in exactly one block, optionally
    sorted by the keys within each block — the substrate for vectorized
    per-run group processing via ``map_batches(fn, batch_size=None)``.

    ``apply_fn`` (a picklable Table -> Table function) runs INSIDE the
    merge/unpack task, fusing the per-partition transform into the
    exchange — one task round (and one materialization barrier) fewer
    than a downstream ``map_batches``.

    Two implementations (same xxhash partition function, identical
    output partitioning):

    - ``tasks`` (default): raw-task map-reduce exchange on warm workers
      (_partition_by_key_tasks) — no aggregator-actor spawns, no per-row
      Python hashing.
    - ``packed``: Arrow-IPC blobs through Ray Data's streaming hash
      shuffle.  Ray 2.49's hash shuffle assigns partitions with a
      pure-Python ``hash(tuple(row))`` loop
      (ray/data/_internal/arrow_ops/transform_pyarrow.py:70, measured
      ~300k rows/s — a flat, width-independent tax on every keyed
      shuffle), so each input block is partitioned VECTORIZED (polars
      ``hash_rows``) and each (block, partition) slice ships as ONE
      IPC blob row; Ray's per-row loop only ever sees
      blocks×partitions rows.  Every block emits a row for EVERY
      partition (zero-row slices included) so no partition is ever
      empty or schemaless downstream.
    """
    if _exchange_mode() == "tasks":
        return _partition_by_key_tasks(ds, list(keys), num_partitions, sort, apply_fn)
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
        return apply_fn(out) if apply_fn is not None else out

    packed = ds.map_batches(pack, batch_format="pyarrow", batch_size=None)
    shuffled = packed.repartition(num_partitions, keys=["__p"], sort=False)
    return shuffled.map_batches(unpack, batch_format="pyarrow", batch_size=None)


def engine_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: tuple | list,
    how: str = "inner",
    num_partitions: int = 8,
) -> rd.Dataset:
    """Join dispatch: task-based hash join (default) or Ray Data's
    native join operator (``RAY_GRAFT_JOIN=native``)."""
    import os as _os

    if _os.environ.get("RAY_GRAFT_JOIN", "tasks") == "tasks":
        return task_join(left, right, on, how=how, num_partitions=num_partitions)
    ensure_hash_shuffle()
    return left.join(right, join_type=how, num_partitions=num_partitions, on=tuple(on))


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

    ``right`` must be unique on ``right_key`` (or left rows duplicate)
    under the native path; the task-join path tolerates duplicates (a
    true hash anti-join).  The marks side is repartitioned to <= its row
    count so no block is empty (Ray 2.49 hash-join breaks when a join
    input's first block is empty).
    """
    import os as _os

    import pyarrow as pa

    right_key = right_key or key
    if _os.environ.get("RAY_GRAFT_JOIN", "tasks") == "tasks":
        keys_only = right.map_batches(
            lambda b, rk=right_key, k=key: pa.table({k: b[rk]}),
            batch_format="pyarrow",
        )
        return task_join(left, keys_only, [key], how="anti", num_partitions=num_partitions)
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


_TASK_STATE: dict[str, tuple[str, object]] = {}


def worker_cached(stage: str, token: str, build):
    """Per-worker-process single-slot state cache for TASK-based stateful
    map_batches stages.

    Actor pools pay a fresh process spawn + package import per actor per
    stage (~2-4 s of pool-startup floor per stage, width-independent —
    the dominant fixed cost in the linkage DAG).  Plain map_batches
    TASKS instead run on Ray's long-lived worker processes, which are
    already warm from earlier stages; this cache gives tasks the same
    build-once-per-process semantics an actor's ``__init__`` provides:
    the first task on a worker builds the state (resolving any broadcast
    ObjectRefs from the LOCAL object store), subsequent tasks reuse it.

    ``token`` fingerprints the state's inputs (object-ref hex + config
    repr); one slot per stage name, so a new run's state evicts the old
    (bounded memory), while coexisting stages don't evict each other.
    """
    cur = _TASK_STATE.get(stage)
    if cur is None or cur[0] != token:
        cur = (token, build())
        _TASK_STATE[stage] = cur
    return cur[1]


_RELEASE_SEEN: dict[str, str] = {}


def release_worker_state(stage: str, once_token: str | None = None) -> None:
    """Drop a worker's cached state for ``stage`` (idempotent, callable
    from any task).  Heavy stage state — the pair scorer's per-worker
    payload copy + row caches run ~0.5 GB/worker — otherwise outlives
    its stage for the whole session and, at 32 workers, pressures every
    downstream stage's allocations.  Downstream stages call this at task
    entry; a worker that never runs a downstream task keeps its slot,
    which is only the status quo.

    ``once_token``: when given, the release fires at most once per
    worker per token — so a downstream stage that (under lazy streaming
    composition) interleaves with its upstream drops the state once,
    not per batch (one bounded rebuild instead of a thrash)."""
    if once_token is not None:
        if _RELEASE_SEEN.get(stage) == once_token:
            return
        _RELEASE_SEEN[stage] = once_token
    _TASK_STATE.pop(stage, None)


def ref_token(*parts) -> str:
    """Stable fingerprint for worker_cached: ObjectRefs by hex, lists
    element-wise, everything else by repr."""
    out = []
    try:
        import ray

        for p in parts:
            if isinstance(p, ray.ObjectRef):
                out.append(p.hex())
            elif isinstance(p, list) and p and isinstance(p[0], ray.ObjectRef):
                out.append(",".join(r.hex() for r in p))
            else:
                out.append(repr(p))
    except Exception:
        out = [repr(p) for p in parts]
    return "|".join(out)


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


# multi-node target: ~256 MB of stage data per shuffle partition — the
# scale knob BASELINE.md prescribes.  Below ~8 GB corpora the row-based
# heuristic governs (aggregator-startup-dominated regime measured on
# this node); above it the byte rule takes over UNCAPPED, so a 100-TB
# corpus gets ~400k partitions instead of saturating a single-node cap.
TARGET_PARTITION_BYTES = 256 << 20


def _byte_partitions(n_bytes: int | None) -> int:
    if not n_bytes or n_bytes <= 0:
        return 0
    return -(-n_bytes // TARGET_PARTITION_BYTES)  # ceil div


def default_partitions(n_rows: int | None = None, n_bytes: int | None = None) -> int:
    """Shuffle partition count.

    Keyed-shuffle parallelism equals the partition count (one aggregator
    actor per partition), but each partition costs actor startup — so the
    count must follow DATA VOLUME, not CPU count: 8 partitions beat 32 on
    a 62k-page corpus (startup-dominated) while larger corpora want more
    aggregators.  ~20k rows per partition balances the two on this node;
    when the caller knows the stage's byte size (``n_bytes``, e.g.
    ``Dataset.size_bytes()`` of the materialized stage or parquet
    metadata), the ~256 MB/partition byte target governs once it exceeds
    the row heuristic — the multi-node path, unbounded above.
    ``RAY_GRAFT_PARTITIONS`` overrides for experiments.
    """
    env = os.environ.get("RAY_GRAFT_PARTITIONS")
    if env:
        return int(env)
    if n_rows is None and n_bytes is None:
        return 8
    row_based = min(32, max(8, (n_rows or 0) // 20_000))
    return max(row_based, _byte_partitions(n_bytes))


def wide_partitions(n_rows: int | None = None, n_bytes: int | None = None) -> int:
    """Partition count for COMPUTE-HEAVY keyed stages (pair enumeration
    inside blocking): unlike the narrow shuffles (decide, fact joins,
    where aggregator startup dominates and 8 partitions win), the
    per-partition work here is CPU-bound, so the partition count is the
    stage's parallelism ceiling — size it so a full-width cluster has
    one task per core at the target ~8k rows/partition; the ~256 MB
    byte target applies as a floor here too (a byte-sized corpus always
    gets at least bytes/256MB-way parallelism)."""
    env = os.environ.get("RAY_GRAFT_PARTITIONS")
    if env:
        return int(env)
    base = default_partitions(n_rows, n_bytes)
    if n_rows is None:
        return max(base, cluster_cpus())
    return max(min(64, max(base, n_rows // 8_000)), _byte_partitions(n_bytes))


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
