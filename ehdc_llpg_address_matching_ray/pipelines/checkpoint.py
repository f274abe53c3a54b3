"""Per-stage Parquet checkpoints with lineage manifests.

Reference analogue: the DB-as-checkpoint J10 anti-join pattern
(internal/engine/matcher.go:150-160) and explicit layer snapshots
(cmd/matcher-v2/rebuild_fact_intelligent.go:9-47).  Here every stage can
be materialized to a partitioned Parquet directory with a
``_manifest.json`` recording row counts, per-file row counts, the
pipeline config hash and optional stage metrics (e.g. score histograms —
the north rule's lineage requirement).  Resume = if a manifest exists
and its config hash matches, the stage re-reads its checkpoint instead
of recomputing (a killed job skips completed stages).
"""

from __future__ import annotations

import json
import os
from typing import Any

import pyarrow.parquet as pq

import ray.data as rd

MANIFEST_NAME = "_manifest.json"


def manifest_path(stage_dir: str) -> str:
    return os.path.join(stage_dir, MANIFEST_NAME)


def load_manifest(stage_dir: str) -> dict | None:
    p = manifest_path(stage_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def has_valid_checkpoint(stage_dir: str, config_hash: str) -> bool:
    """True when ``checkpoint(...)`` would resume from ``stage_dir``
    without recomputing — lets callers skip building the stage's input
    graph entirely (e.g. the flagship's eager edge scan)."""
    m = load_manifest(stage_dir)
    return m is not None and m.get("config_hash") == config_hash and bool(m.get("complete"))


def checkpoint(
    ds: rd.Dataset,
    stage_dir: str,
    config_hash: str,
    stage_name: str,
    extras: dict[str, Any] | None = None,
    resume: bool = True,
) -> rd.Dataset:
    """Materialize ``ds`` to ``stage_dir`` (or reuse an existing valid
    checkpoint) and return a Dataset reading from it.

    The read-back truncates lineage: downstream stages re-execute from
    the checkpoint files, not from the upstream compute graph.
    """
    m = load_manifest(stage_dir) if resume else None
    data_dir = os.path.join(stage_dir, "data")
    if m is not None and m.get("config_hash") == config_hash and m.get("complete"):
        return rd.read_parquet(data_dir)

    os.makedirs(data_dir, exist_ok=True)
    # clear any partial previous attempt
    for f in os.listdir(data_dir):
        os.remove(os.path.join(data_dir, f))
    ds.write_parquet(data_dir)

    files = sorted(
        os.path.join(data_dir, f) for f in os.listdir(data_dir) if f.endswith(".parquet")
    )
    per_file = {}
    total = 0
    for f in files:
        nrows = pq.read_metadata(f).num_rows
        per_file[os.path.basename(f)] = nrows
        total += nrows

    manifest = {
        "stage": stage_name,
        "config_hash": config_hash,
        "rows": total,
        "files": per_file,
        "complete": True,
    }
    if extras:
        manifest["metrics"] = extras
    with open(manifest_path(stage_dir), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return rd.read_parquet(data_dir)


def score_histogram(ds: rd.Dataset, col: str = "score", bins: int = 20) -> dict:
    """Small aggregate for the manifest: score histogram + count."""
    import numpy as np

    counts = np.zeros(bins, dtype=int)
    n = 0
    for batch in ds.select_columns([col]).iter_batches(batch_size=65536, batch_format="pyarrow"):
        vals = batch[col].to_numpy(zero_copy_only=False)
        n += len(vals)
        hist, _ = np.histogram(np.clip(vals, 0.0, 1.0), bins=bins, range=(0.0, 1.0))
        counts += hist
    return {"count": int(n), "histogram": counts.tolist(), "bins": bins}
