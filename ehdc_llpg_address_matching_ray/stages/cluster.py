"""Transitive clustering: distributed union-find as iterated groupby-min
label propagation to fixpoint.

Reference analogue: the group-consensus clustering G1
(cmd/matcher-v2/main.go:759-1032) is a one-hop version; the north rule
generalizes it to full connected components (BTS ICDE'24 in PAPERS.md is
the published distributed-union-find pattern; we implement the simpler
min-label propagation whose rounds are O(component diameter), bounded).

Two paths:
- ``label_propagation``: pure Ray Data — per round one hash join
  (labels ⋈ edges) + one groupby-min, materialized per round, early-exit
  when no label changes.  This is the 100-TB path: labels are two
  narrow columns, edges shuffle by endpoint.
- ``driver_union_find``: when the edge count is below a threshold the
  edge list streams to the driver (iter_batches) through a classic
  union-find — cheaper than J rounds of shuffle for small graphs.  The
  pipeline picks by measured edge count; both paths are tested to give
  identical partitions.

Node ids are 63-bit int64 fingerprints of urls (stable, collision-checked in
tests); cluster_id = min node id in the component.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Min

from ..rayutil import partition_by_key


def url_to_node_id(urls: list[str]) -> np.ndarray:
    """Stable 63-bit id: top 8 bytes of md5(url) masked to int64-positive.

    int64 (not uint64) because Arrow hash-partition/groupby keys above
    2^63-1 overflow the C-long conversion inside Ray's shuffle and fall
    back to pickled-object extension arrays; 63 bits keeps every shuffle
    key a concrete integer column (collision-checked in tests)."""
    return np.array(
        [
            int.from_bytes(hashlib.md5(u.encode("utf-8")).digest()[:8], "big")
            & 0x7FFF_FFFF_FFFF_FFFF
            for u in urls
        ],
        dtype=np.int64,
    )


def add_node_ids(batch: pa.Table, url_col: str, out_col: str) -> pa.Table:
    ids = url_to_node_id(batch[url_col].to_pylist())
    return batch.append_column(out_col, pa.array(ids, pa.int64()))


def _hash_url_col(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """url column -> node ids, md5-hashing each DISTINCT url once: edge
    endpoints repeat (one rep participates in several edges), so
    dictionary-encode first and hash only the dictionary."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = col.dictionary_encode()
    h = url_to_node_id(d.dictionary.to_pylist())
    return h[d.indices.to_numpy()]


def _edges_to_ids(batch: pa.Table) -> pa.Table:
    a = _hash_url_col(batch["url_a"])
    b = _hash_url_col(batch["url_b"])
    return pa.table({"u": pa.array(a, pa.int64()), "v": pa.array(b, pa.int64())})


def edge_ids_from_scored(batch: pa.Table) -> pa.Table:
    """Fused edge extraction for the flagship DAG: scored-pairs batch ->
    int64 (u, v) edge ids in ONE operator (filter on is_edge + project).
    Id-keyed scored tables (id_a/id_b) pass their ids straight through —
    they ARE the node ids; url-keyed tables hash per distinct url.
    Feeding ``connected_components(..., edges_as_ids=True)`` with this
    avoids a second full scan of the wide scored table and materializes
    16 bytes/edge instead of two url strings."""
    t = batch.filter(batch["is_edge"].combine_chunks())
    if "id_a" in t.column_names:
        return pa.table({"u": t["id_a"], "v": t["id_b"]})
    return _edges_to_ids(t)


def _symmetrize(batch: pa.Table) -> pa.Table:
    u = batch["u"].combine_chunks()
    v = batch["v"].combine_chunks()
    return pa.table(
        {
            "u": pa.concat_arrays([u, v]),
            "v": pa.concat_arrays([v, u]),
        }
    )


def _rebuild_labels(b: pa.Table) -> pa.Table:
    """Rebuild (node_id, label) with concrete int64 columns — groupby
    aggregates can emit pickled-object extension arrays for the key."""
    return pa.table(
        {
            "node_id": pa.array(b["node_id"].to_pylist(), pa.int64()),
            "label": pa.array(b["label"].to_pylist(), pa.int64()),
        }
    )


def label_propagation(
    nodes_ds: rd.Dataset,
    edges_ds: rd.Dataset,
    max_iters: int = 25,
    num_partitions: int = 16,
    edges_as_ids: bool = False,
) -> rd.Dataset:
    """nodes (url), edges (url_a, url_b) -> (url, cluster_id).

    Per round: new_label(v) = min(label(v), min_{(u,v)∈E} label(u)),
    via join(edges, labels on u) ∪ labels -> groupby(v).min.

    The per-round ``repartition`` is load-bearing, not cosmetic: the
    union + groupby otherwise accumulates empty zero-column blocks whose
    schemaless shards poison the NEXT round's hash-shuffle join schema
    broadcast ("No match or multiple matches for key field node_id",
    observed on ray 2.49).  Repartition rebuilds uniform-schema blocks
    and keeps the label table's block count constant across rounds.
    """
    nodes = nodes_ds.map_batches(
        lambda b: add_node_ids(b, "url", "node_id"), batch_format="pyarrow"
    ).materialize()
    id_edges = (
        edges_ds if edges_as_ids else edges_ds.map_batches(_edges_to_ids, batch_format="pyarrow")
    )
    edges = id_edges.map_batches(_symmetrize, batch_format="pyarrow").materialize()

    labels = nodes.map_batches(
        lambda b: pa.table({"node_id": b["node_id"], "label": b["node_id"]}),
        batch_format="pyarrow",
    ).materialize()
    n_nodes = labels.count()

    def min_with_changed(df):
        """Per-partition groupby-min WITH the convergence count folded in
        (labels are monotonically non-increasing, so changed = new < old;
        a separate diff-join per round would cost one more full shuffle).
        The partition's changed count rides in the first row's ``changed``
        column; ``Dataset.sum`` collects it without a shuffle."""
        import pandas as pd

        if len(df) == 0:
            return pd.DataFrame(
                {
                    "node_id": pd.Series([], dtype="int64"),
                    "label": pd.Series([], dtype="int64"),
                    "changed": pd.Series([], dtype="int64"),
                }
            )
        new = df.groupby("node_id", sort=False, as_index=False)["label"].min()
        old = df[df["src"] == 0].set_index("node_id")["label"]
        n_changed = int(
            (new["label"].to_numpy() < old.reindex(new["node_id"]).to_numpy()).sum()
        )
        new["changed"] = 0
        if len(new):
            new.iloc[0, new.columns.get_loc("changed")] = n_changed
        return new

    for _ in range(max_iters):
        base = labels.map_batches(
            lambda b: pa.table(
                {
                    "node_id": pa.array(b["node_id"].to_pylist(), pa.int64()),
                    "label": pa.array(b["label"].to_pylist(), pa.int64()),
                    "src": pa.array([0] * b.num_rows, pa.int8()),
                }
            ),
            batch_format="pyarrow",
        )
        from ..rayutil import engine_join

        labels_u = labels.map_batches(
            lambda b: pa.table({"u": b["node_id"], "label": b["label"]}),
            batch_format="pyarrow",
        )
        prop = engine_join(
            edges, labels_u, ("u",), how="inner", num_partitions=num_partitions
        ).map_batches(
            lambda b: pa.table(
                {
                    "node_id": b["v"],
                    "label": b["label"],
                    "src": pa.array([1] * b.num_rows, pa.int8()),
                }
            ),
            batch_format="pyarrow",
        )
        combined = base.union(prop)
        # keyed repartition + C-speed pandas min per partition: Ray's
        # groupby aggregate costs ~1 ms/group of Python, and the group
        # count here equals the node count
        new_labels = (
            partition_by_key(combined, ["node_id"], num_partitions, sort=False)
            .map_batches(min_with_changed, batch_format="pandas", batch_size=None)
            .map_batches(
                lambda b: pa.table(
                    {
                        "node_id": pa.array(b["node_id"].to_pylist(), pa.int64()),
                        "label": pa.array(b["label"].to_pylist(), pa.int64()),
                        "changed": pa.array(b["changed"].to_pylist(), pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        changed = new_labels.sum("changed")
        # compact: no empty leading blocks (Ray 2.49 join breaks on them)
        labels = (
            new_labels.select_columns(["node_id", "label"])
            .repartition(max(1, min(num_partitions, n_nodes)))
            .materialize()
        )
        if not changed:
            break

    from ..rayutil import engine_join

    out = engine_join(
        nodes, labels, ("node_id",), how="inner", num_partitions=num_partitions
    ).map_batches(
        lambda b: pa.table({"url": b["url"], "cluster_id": b["label"]}),
        batch_format="pyarrow",
    )
    return out


def _min_label_components(eu: np.ndarray, ev: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized min-label propagation over an int64 edge list:
    (sorted distinct node ids, component min-id per node).  np.minimum.at
    rounds + pointer jumping converge in O(log diameter) passes."""
    ids = np.unique(np.concatenate([eu, ev])) if len(eu) else np.array([], dtype=np.int64)
    cu = np.searchsorted(ids, eu)
    cv = np.searchsorted(ids, ev)
    label = np.arange(len(ids), dtype=np.int64)
    while True:
        new = label.copy()
        # min over incident edges, both directions; unordered np.minimum.at
        # accumulation is exact for min
        np.minimum.at(new, cv, label[cu])
        np.minimum.at(new, cu, label[cv])
        # pointer jumping: labels are indices into ids (sorted ascending, so
        # index order == id order and the fixpoint label is the component min)
        new = np.minimum(new, new[new])
        if np.array_equal(new, label):
            break
        label = new
    cluster_of = ids[label] if len(ids) else ids
    return ids, cluster_of


def _uf_over_blocks(*blocks) -> tuple[np.ndarray, np.ndarray]:
    """Union-find over materialized int64 (u, v) edge blocks — runs as a
    single remote task so the driver can interleave other work (the
    decide chain) while components compute."""
    eu_parts = [b["u"].to_numpy() for b in blocks if b.num_rows]
    ev_parts = [b["v"].to_numpy() for b in blocks if b.num_rows]
    eu = np.concatenate(eu_parts) if eu_parts else np.array([], dtype=np.int64)
    ev = np.concatenate(ev_parts) if ev_parts else np.array([], dtype=np.int64)
    return _min_label_components(eu, ev)


def _assign_labels_map(uf_ref):
    """(url) batches -> (url, cluster_id) via the (ids, labels) pair in
    ``uf_ref`` (None = no edges: every node self-labels)."""

    def assign(batch: pa.Table) -> pa.Table:
        if uf_ref is None:
            ids_l = np.array([], dtype=np.int64)
            lab = ids_l
        else:
            ids_l, lab = ray.get(uf_ref)
        nid = url_to_node_id(batch["url"].to_pylist())
        if len(ids_l):
            pos = np.minimum(np.searchsorted(ids_l, nid), len(ids_l) - 1)
            hit = ids_l[pos] == nid
            labels = np.where(hit, lab[pos], nid)  # isolated nodes self-label
        else:
            labels = nid
        return pa.table({"url": batch["url"], "cluster_id": pa.array(labels, pa.int64())})

    return assign


def connected_components_deferred(
    nodes_ds: rd.Dataset,
    id_edges_mat: rd.Dataset,
    n_edges: int,
    max_iters: int = 25,
    driver_threshold: int = 20_000_000,
) -> rd.Dataset:
    """Small-graph path with the union-find OFF the driver's critical
    path: submits one remote task over the (already materialized) int64
    edge blocks and returns a LAZY (url, cluster_id) dataset — the caller
    interleaves other driver work (the flagship's decide chain) before
    consuming it, so the component computation overlaps instead of
    serializing.  Above ``driver_threshold`` falls back to the
    distributed label propagation (sequential, 100-TB path)."""
    if n_edges > driver_threshold:
        return label_propagation(
            nodes_ds, id_edges_mat, max_iters=max_iters, edges_as_ids=True
        )
    refs = id_edges_mat.to_arrow_refs()
    uf_ref = ray.remote(num_cpus=1)(_uf_over_blocks).remote(*refs) if refs else None
    return nodes_ds.map_batches(_assign_labels_map(uf_ref), batch_format="pyarrow")


def driver_union_find(
    nodes_ds: rd.Dataset, edges_ds: rd.Dataset, edges_as_ids: bool = False
) -> rd.Dataset:
    """Small-graph fast path: vectorized min-label propagation over the
    edge list on the driver; returns (url, cluster_id).  Identical
    partitions to label_propagation (tested).

    The url->id hashing runs DISTRIBUTED (map_batches before
    iter_batches) — only two int64 columns ever reach the driver — and
    the component computation is numpy throughout (_min_label_components),
    replacing the per-edge Python union-find loop that dominated this
    stage at millions of edges."""
    eu_parts: list[np.ndarray] = []
    ev_parts: list[np.ndarray] = []
    id_edges = (
        edges_ds if edges_as_ids else edges_ds.map_batches(_edges_to_ids, batch_format="pyarrow")
    )
    for batch in id_edges.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        eu_parts.append(batch["u"].to_numpy())
        ev_parts.append(batch["v"].to_numpy())
    eu = np.concatenate(eu_parts) if eu_parts else np.array([], dtype=np.int64)
    ev = np.concatenate(ev_parts) if ev_parts else np.array([], dtype=np.int64)
    ids, cluster_of = _min_label_components(eu, ev)

    ids_ref = ray.put(ids)
    lab_ref = ray.put(cluster_of)

    def assign(batch: pa.Table) -> pa.Table:
        ids_l = ray.get(ids_ref)
        lab = ray.get(lab_ref)
        nid = url_to_node_id(batch["url"].to_pylist())
        if len(ids_l):
            pos = np.minimum(np.searchsorted(ids_l, nid), len(ids_l) - 1)
            hit = ids_l[pos] == nid
            labels = np.where(hit, lab[pos], nid)  # isolated nodes self-label
        else:
            labels = nid
        return pa.table({"url": batch["url"], "cluster_id": pa.array(labels, pa.int64())})

    return nodes_ds.map_batches(assign, batch_format="pyarrow")


def connected_components(
    nodes_ds: rd.Dataset,
    edges_ds: rd.Dataset,
    max_iters: int = 25,
    driver_threshold: int = 20_000_000,
    edges_as_ids: bool = False,
) -> rd.Dataset:
    """Choose the path by measured edge count (the pipeline's default).

    The driver threshold is generous (20M edges = 320 MB of int64 pairs,
    ~1-2 s of vectorized numpy on the driver): below it the in-memory
    min-label propagation beats J rounds of join+groupby shuffle whose
    per-round overhead dominates small graphs; the distributed path
    exists for the 100-TB regime where the edge list dwarfs any single
    machine."""
    # hash BEFORE materializing: edges is usually a lazy filter over the
    # (wide) scored table; materializing int64 (u, v) keeps 16 bytes/edge
    # in the store instead of two url strings, and the count + the chosen
    # path would otherwise each rescan the wide table
    if not edges_as_ids:
        edges_ds = edges_ds.map_batches(_edges_to_ids, batch_format="pyarrow")
    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()
    if n_edges <= driver_threshold:
        return driver_union_find(nodes_ds, edges_ds, edges_as_ids=True)
    return label_propagation(nodes_ds, edges_ds, max_iters=max_iters, edges_as_ids=True)
