"""End-to-end training-data curation pipeline: the engine's dedup /
quality / scrub operators composed into one streaming Ray Data DAG —
what a user pointing this repo at a raw 100-TB web-text dump would run
before tokenization.

Stages (each either stateless map_batches or exactly ONE keyed shuffle):

  01 quality  — Gopher repetition/length gates (``TS.gopher_signals``,
                vectorized token codes, no per-row loop) + optional
                language allow-list.
  02 exact    — corpus-wide exact dedup: md5(text) keyed shuffle, keep
                the min-doc_id row per hash inside each partition.
  03 neardup  — MinHash-LSH candidate pairs (``stages.blocking``) →
                exact char-shingle Jaccard verification per pair →
                connected components → keep each component's min-label
                representative.
  04 pii      — RE2 email/phone/IPv4 redaction (``TS.pii_scrub``).
  05 split    — deterministic md5-bucket train/valid/test assignment
                (reproducible across engines, runs and cluster sizes).
  06 write    — one parquet directory per split (resumable layout).

Scale notes: the exact-dedup shuffle moves the corpus once (hash +
payload); the near-dup block shuffle moves integer keys only; component
labels resolve through the same ``connected_components`` driver/
label-prop split the flagship uses (driver below 20M edges, distributed
label propagation above).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..config import BlockingConfig
from ..functions import textstats as TS
from ..rayutil import engine_join, partition_by_key
from ..stages import blocking as B
from ..stages.cluster import connected_components, url_to_node_id


@dataclass(frozen=True)
class CurationConfig:
    min_tokens: int = 10
    max_top_tok_frac: float = 0.2
    max_dup_2gram_frac: float = 0.9
    min_mean_tok_len: float = 2.0
    max_mean_tok_len: float = 12.0
    keep_langs: tuple[str, ...] | None = None  # None = all languages
    neardup: bool = True
    neardup_threshold: float = 0.8  # exact shingle-Jaccard verify gate
    redact_pii: bool = True
    blocking: BlockingConfig = field(
        default_factory=lambda: BlockingConfig(use_prefix_key=False)
    )
    num_partitions: int = 8


def quality_filter(docs: rd.Dataset, cfg: CurationConfig) -> rd.Dataset:
    """Stage 01: keep rows passing the Gopher gates (and the language
    allow-list when configured).  Stateless, vectorized, no shuffle."""

    def f(b: pa.Table) -> pa.Table:
        sig = TS.gopher_signals(b["text"])
        keep = (
            (sig["n_tokens"] >= cfg.min_tokens)
            & (sig["top_tok_frac"] <= cfg.max_top_tok_frac)
            & (sig["dup_2gram_frac"] <= cfg.max_dup_2gram_frac)
            & (sig["mean_tok_len"] >= cfg.min_mean_tok_len)
            & (sig["mean_tok_len"] <= cfg.max_mean_tok_len)
        )
        if cfg.keep_langs is not None:
            langs = b["lang"].to_numpy(zero_copy_only=False)
            keep = keep & np.isin(langs, np.asarray(cfg.keep_langs))
        return b.filter(pa.array(keep))

    return docs.map_batches(f, batch_format="pyarrow")


def exact_dedup(docs: rd.Dataset, cfg: CurationConfig) -> rd.Dataset:
    """Stage 02: one keyed shuffle on md5(text); the min-doc_id row of
    each hash group survives (sorted-run first mark, vectorized)."""

    def add_hash(b: pa.Table) -> pa.Table:
        return b.append_column(
            "text_hash", pa.array(TS.md5_hex(b["text"].to_pylist()), pa.string())
        )

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["text_hash", "doc_id"], kind="mergesort")
        d = d[~d["text_hash"].duplicated()]
        return d.drop(columns=["text_hash"]).reset_index(drop=True)

    hashed = docs.map_batches(add_hash, batch_format="pyarrow")
    return partition_by_key(
        hashed, ["text_hash"], cfg.num_partitions, sort=False
    ).map_batches(keep_first, batch_format="pandas", batch_size=None)


def neardup_dedup(docs: rd.Dataset, cfg: CurationConfig) -> rd.Dataset:
    """Stage 03: MinHash-LSH near-dup removal with VERIFICATION.  LSH
    band keys generate candidates; an exact char-shingle Jaccard gate
    (``MH.pair_char_jaccard``, vectorized) confirms each pair before it
    becomes an edge — unverified LSH candidates at web scale chain into
    giant components and delete distinct documents.  The component label
    is the min node id; each component keeps exactly its label-owning
    row, rejoined to the payload through one keyed join."""
    from ..functions import minhash as MH

    def prep(b: pa.Table) -> pa.Table:
        urls = [str(i) for i in b["doc_id"].to_pylist()]
        canon = pc.utf8_upper(pc.fill_null(b["text"], ""))
        return pa.table(
            {
                "nid": pa.array(url_to_node_id(urls), pa.int64()),
                "text": canon,
                "canonical": canon,
            }
        )

    keyed = docs.map_batches(prep, batch_format="pyarrow")
    pairs = B.build_blocks(
        keyed, cfg.blocking, num_partitions=cfg.num_partitions, attach_payload=True
    )

    def verify(b: pa.Table) -> pa.Table:
        j = MH.pair_char_jaccard(
            b["canonical_a"].to_pylist(), b["canonical_b"].to_pylist()
        )
        t = b.filter(pa.array(j >= cfg.neardup_threshold))
        return pa.table({"u": t["id_a"], "v": t["id_b"]})

    edges = pairs.map_batches(verify, batch_format="pyarrow")

    def node_urls(b: pa.Table) -> pa.Table:
        return pa.table(
            {"url": pa.array([str(i) for i in b["doc_id"].to_pylist()], pa.string())}
        )

    nodes = docs.map_batches(node_urls, batch_format="pyarrow")
    labels = connected_components(nodes, edges, edges_as_ids=True)

    def label_key(b: pa.Table) -> pa.Table:
        # survivor ⇔ this row OWNS its component label (min node id)
        nid = url_to_node_id(b["url"].to_pylist())
        keep = nid == b["cluster_id"].to_numpy(zero_copy_only=False)
        t = b.filter(pa.array(keep))
        return pa.table({"doc_id": pc.cast(t["url"], pa.int64())})

    survivors = labels.map_batches(label_key, batch_format="pyarrow")
    return engine_join(
        docs, survivors, ("doc_id",), how="inner", num_partitions=cfg.num_partitions
    )


def pii_and_split(docs: rd.Dataset, cfg: CurationConfig) -> rd.Dataset:
    """Stages 04+05 fused (both stateless): redact PII in place and
    assign the deterministic md5-bucket split."""

    def f(b: pa.Table) -> pa.Table:
        out = b
        if cfg.redact_pii:
            scrub = TS.pii_scrub(b["text"])
            out = out.drop_columns(["text"]).append_column("text", scrub["redacted"])
            for c in ("n_emails", "n_phones", "n_ips"):
                out = out.append_column(c, scrub[c])
        ids = out["doc_id"].to_pylist()
        buckets = np.array(
            [int(h[:8], 16) % 1000 for h in TS.md5_hex([str(i) for i in ids])],
            dtype=np.int64,
        )
        split = np.where(buckets < 900, "train", np.where(buckets < 950, "valid", "test"))
        return out.append_column("split", pa.array(split, pa.string()))

    return docs.map_batches(f, batch_format="pyarrow")


def run_curation(docs: rd.Dataset, cfg: CurationConfig | None = None) -> rd.Dataset:
    """Compose stages 01-05; returns the curated Dataset (lazy)."""
    cfg = cfg or CurationConfig()
    out = quality_filter(docs, cfg)
    out = exact_dedup(out, cfg)
    if cfg.neardup:
        # neardup consumes its input three times (block keys, node list,
        # payload rejoin) — pin it once so the quality+dedup prefix does
        # not re-execute per consumer (and overlapping join pools cannot
        # deadlock on a shared lazy input)
        out = out.materialize()
        out = neardup_dedup(out, cfg)
    return pii_and_split(out, cfg)


def write_curated(curated: rd.Dataset, out_dir: str) -> dict[str, int]:
    """Stage 06: one parquet directory per split (a failed run reruns a
    split directory, not the corpus).  Returns per-split row counts."""
    import os

    curated = curated.materialize()
    counts: dict[str, int] = {}
    for split in ("train", "valid", "test"):
        part = curated.filter(expr=f"split == '{split}'")
        path = os.path.join(out_dir, f"split={split}")
        os.makedirs(path, exist_ok=True)
        part.write_parquet(path)
        counts[split] = part.count()
    return counts
