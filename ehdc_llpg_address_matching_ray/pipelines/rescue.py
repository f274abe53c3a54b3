"""G2 — group fuzzy rescue, and G7 — historic-key creation.

G2 reference (cmd/matcher-v2/main.go:1367-1594): groups (size 2-30, by
``group_key``/planning_app_base) where NO member matched above 0.5 pick
their longest real address as representative (:1395-1401), fuzzy-match
the representative against the gazetteer, accept when similarity >= 0.5
and Levenshtein <= 25 (:1508-1509), and propagate the hit to every group
member at banded confidence 0.85 / 0.75 / 0.65 for sim >= 0.7 / >= 0.5 /
else (:1539-1543).

G7 reference (cmd/bulk-historic-uprns/main.go:78-248 + doc
ADDRESS_MATCHING_PROCESS.md:35-49): legacy keys present on sources but
ABSENT from the gazetteer become new historic gazetteer rows —
anti-join, distinct, append partition.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..config import PipelineConfig
from ..functions import components as CP
from ..functions import strings as S
from ..rayutil import engine_join, hash_shuffle, partition_by_key
from .match import normalize_uprn_batch, run_match


def pick_reps_partition(df: pd.DataFrame) -> pd.DataFrame:
    """Per group (within one group_key partition): size 2-30, best score
    < 0.5, >=1 real address -> emit the longest real address as
    representative (cmd/matcher-v2/main.go:1395-1401).

    Vectorized (sorted-run reduceat, no per-group Python).  Length ties
    pin to the smallest ``src_id`` (string order) — the reference's
    longest-pick does not specify a tie order and the old pandas
    quicksort pick was nondeterministic; src_id ASC is deterministic and
    SQL-expressible (the rescue_reps oracle relies on it)."""
    import numpy as np

    n = len(df)
    if n == 0:
        return pd.DataFrame(columns=["group_key", "rep_src", "rep_address"])
    m_score = df["m_score"].fillna(0.0).to_numpy(dtype=np.float64)
    raw = df["raw_address"].to_numpy(dtype=object)
    is_real = np.fromiter((CP.is_real_address(t or "") for t in raw), bool, n)
    gk = df["group_key"].to_numpy(dtype=object)
    src = df["src_id"].to_numpy(dtype=object)
    codes, uniq = pd.factorize(gk, sort=False)
    G = len(uniq)
    order = np.argsort(codes, kind="stable")
    c = codes[order]
    starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
    total = np.diff(np.r_[starts, n])
    gmax = np.maximum.reduceat(m_score[order], starts)
    has_real = np.zeros(G, dtype=bool)
    if is_real.any():
        has_real[np.unique(codes[is_real])] = True
    ok = (total >= 2) & (total <= 30) & (gmax < 0.5) & has_real
    if not ok.any():
        return pd.DataFrame(columns=["group_key", "rep_src", "rep_address"])
    # longest real row per group: lexsort real rows by
    # (group, -len, src_id rank), take the first of each group run
    ri = np.flatnonzero(is_real)
    lens = np.fromiter((len(raw[i] or "") for i in ri), np.int64, len(ri))
    sid_rank, _ = pd.factorize(src[ri], sort=True)
    rorder = ri[np.lexsort((sid_rank, -lens, codes[ri]))]
    rc = codes[rorder]
    rfirst = rorder[np.flatnonzero(np.r_[True, rc[1:] != rc[:-1]])]
    rep_rows = rfirst[ok[codes[rfirst]]]
    return pd.DataFrame(
        {
            "group_key": pd.Series(gk[rep_rows], dtype="object"),
            "rep_src": pd.Series(src[rep_rows], dtype="object"),
            "rep_address": pd.Series(raw[rep_rows], dtype="object"),
        }
    )


def pick_group_reps(
    sources_ds: rd.Dataset,
    matches_ds: rd.Dataset,
    source_id: str = "src_id",
    source_text: str = "raw_address",
    group_col: str = "group_key",
    num_partitions: int = 8,
) -> rd.Dataset:
    """The G2 rep-pick stage as a standalone surface (oracled by the
    ``rescue_reps`` driver query): sources ⟕ match scores, keyed
    repartition by group, vectorized gate + longest-real-address pick."""
    with hash_shuffle():
        src = sources_ds.map_batches(
            lambda b: pa.table(
                {
                    "src_id": b[source_id].cast(pa.string()),
                    "raw_address": b[source_text],
                    "group_key": b[group_col].cast(pa.string()),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        scored = matches_ds.map_batches(
            lambda b: pa.table({"src_id": b["src_id"], "m_score": b["score"]}),
            batch_format="pyarrow",
        )
        j = engine_join(src, scored, ("src_id",), how="left_outer", num_partitions=num_partitions)
        return partition_by_key(j, ["group_key"], num_partitions, sort=False).map_batches(
            pick_reps_partition, batch_format="pandas", batch_size=None
        )


def group_rescue(
    sources_ds: rd.Dataset,
    matches_ds: rd.Dataset,
    gazetteer_ds: rd.Dataset,
    cfg: PipelineConfig | None = None,
    source_id: str = "src_id",
    source_text: str = "raw_address",
    group_col: str = "group_key",
    gaz_id: str = "uprn",
    gaz_text: str = "full_address",
    min_similarity: float = 0.5,
    max_edit_distance: int = 25,
    num_partitions: int = 8,
) -> rd.Dataset:
    """Rescue corrections ``(src_id, corrected_id, group_key, confidence)``
    for members of unmatched groups — feed into
    ``corrections.apply_corrections``."""
    cfg = cfg or PipelineConfig()
    with hash_shuffle():
        src = sources_ds.map_batches(
            lambda b: pa.table(
                {
                    "src_id": b[source_id].cast(pa.string()),
                    "raw_address": b[source_text],
                    "group_key": b[group_col].cast(pa.string()),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        scored = matches_ds.map_batches(
            lambda b: pa.table({"src_id": b["src_id"], "m_score": b["score"]}),
            batch_format="pyarrow",
        )
        j = engine_join(src, scored, ("src_id",), how="left_outer", num_partitions=num_partitions)

        reps = (
            partition_by_key(j, ["group_key"], num_partitions, sort=False)
            .map_batches(pick_reps_partition, batch_format="pandas", batch_size=None)
            # coalesce: the per-partition picker leaves empty (sometimes
            # schema-degenerate) blocks that poison downstream joins; the
            # reps table is tiny by construction (<= one row per group)
            .repartition(1)
            .materialize()
        )
        if reps.count() == 0:
            return _empty_corrections()

        # fuzzy-match the representatives against the gazetteer (tier-B
        # reuse: blocking + scoring + per-source decide)
        rep_sources = reps.map_batches(
            lambda b: pa.table({"src_id": b["group_key"], "raw_address": b["rep_address"]}),
            batch_format="pyarrow",
        )
        rescue_cfg = cfg
        m = run_match(
            rep_sources, gazetteer_ds, rescue_cfg,
            source_id="src_id", source_text="raw_address",
            gaz_id=gaz_id, gaz_text=gaz_text,
        )
        # DISTRIBUTED rejoin (no driver gazetteer LUT, which would be
        # O(gazetteer) driver memory at scale): matched reps ⋈ reps (their
        # own text) ⋈ gazetteer (candidate text), then the similarity +
        # Levenshtein gate (:1508-1509) and confidence banding
        # (:1539-1543) inside a map_batches.
        hits = (
            m["matches"]
            .map_batches(
                lambda b: b.filter(
                    pc.and_(
                        pc.is_valid(b["matched_id"]),
                        pc.not_equal(pc.coalesce(b["matched_id"], ""), ""),
                    )
                ).select(["src_id", "matched_id", "score"]),
                batch_format="pyarrow",
            )
            .materialize()
        )
        n_hits = hits.count()
        if n_hits == 0:
            return _empty_corrections()
        hits = hits.repartition(max(1, min(num_partitions, n_hits))).materialize()

        rep_txt = reps.map_batches(
            lambda b: pa.table({"src_id": b["group_key"], "rep_address": b["rep_address"]}),
            batch_format="pyarrow",
        )
        hits = engine_join(
            hits, rep_txt, ("src_id",), how="inner", num_partitions=num_partitions
        ).materialize()
        n_hits = hits.count()
        if n_hits == 0:
            return _empty_corrections()
        hits = hits.repartition(max(1, min(num_partitions, n_hits))).materialize()

        gaz_txt = gazetteer_ds.map_batches(
            lambda b: pa.table(
                {
                    "matched_id": b[gaz_id].cast(pa.string()),
                    "cand_text": pc.coalesce(b[gaz_text], ""),
                }
            ),
            batch_format="pyarrow",
        )
        hits = engine_join(hits, gaz_txt, ("matched_id",), how="inner", num_partitions=num_partitions)

        def gate(b: pa.Table) -> pa.Table:
            gks, cids, confs = [], [], []
            for gk, mid, sim, rep_addr, cand in zip(
                b["src_id"].to_pylist(),
                b["matched_id"].to_pylist(),
                b["score"].to_pylist(),
                b["rep_address"].to_pylist(),
                b["cand_text"].to_pylist(),
            ):
                lev = S.levenshtein_distance((rep_addr or "").upper(), (cand or "").upper())
                if sim >= min_similarity and lev <= max_edit_distance:
                    gks.append(gk)
                    cids.append(str(mid))
                    confs.append(0.85 if sim >= 0.7 else (0.75 if sim >= 0.5 else 0.65))
            return pa.table(
                {
                    "group_key": pa.array(gks, pa.string()),
                    "corrected_id": pa.array(cids, pa.string()),
                    "confidence": pa.array(confs, pa.float64()),
                }
            )

        kt = hits.map_batches(gate, batch_format="pyarrow").materialize()
        n_keep = kt.count()
        if n_keep == 0:
            return _empty_corrections()
        kt = kt.repartition(max(1, min(num_partitions, n_keep))).materialize()

        # propagate to every group member (the fan-out join)
        out = engine_join(src, kt, ("group_key",), how="inner", num_partitions=num_partitions)
        return out.map_batches(
            lambda b: pa.table(
                {
                    "src_id": b["src_id"],
                    "corrected_id": b["corrected_id"],
                    "group_key": b["group_key"],
                    "confidence": b["confidence"],
                }
            ),
            batch_format="pyarrow",
        )


def _empty_corrections() -> rd.Dataset:
    return rd.from_arrow(
        pa.table(
            {
                "src_id": pa.array([], pa.string()),
                "corrected_id": pa.array([], pa.string()),
                "group_key": pa.array([], pa.string()),
                "confidence": pa.array([], pa.float64()),
            }
        )
    )


def create_historic_keys(
    sources_ds: rd.Dataset,
    gazetteer_ds: rd.Dataset,
    source_key: str = "legacy_uprn",
    source_text: str = "raw_address",
    gaz_id: str = "uprn",
    num_partitions: int = 8,
) -> rd.Dataset:
    """G7: source legacy keys absent from the gazetteer -> distinct new
    historic gazetteer rows ``(uprn, full_address, historic)`` ready to
    append as a partition (anti-join -> distinct -> append)."""
    with hash_shuffle():
        keys = sources_ds.map_batches(
            lambda b: pa.table(
                {
                    "legacy_key": normalize_uprn_batch(b[source_key]),
                    "raw_address": b[source_text],
                }
            ),
            batch_format="pyarrow",
        ).map_batches(
            lambda b: b.filter(
                pc.and_(pc.is_valid(b["legacy_key"]), pc.not_equal(pc.coalesce(b["legacy_key"], ""), ""))
            ),
            batch_format="pyarrow",
        )
        gaz_keys = gazetteer_ds.map_batches(
            lambda b: pa.table(
                {
                    "legacy_key": b[gaz_id].cast(pa.string()),
                    "present": pa.array([1] * b.num_rows, pa.int8()),
                }
            ),
            batch_format="pyarrow",
        )
        j = engine_join(
            keys, gaz_keys, ("legacy_key",), how="left_outer", num_partitions=num_partitions
        )
        missing = j.map_batches(
            lambda b: b.filter(pc.is_null(b["present"])), batch_format="pyarrow"
        )
        # distinct by key, keep the longest source address as the label
        return partition_by_key(
            missing.select_columns(["legacy_key", "raw_address"]), ["legacy_key"], num_partitions,
            sort=False,
        ).map_batches(
            # tie-break on equal lengths: raw_address ASC (deterministic
            # and SQL-expressible — the historic_keys oracle relies on it)
            lambda df: df.assign(_len=df["raw_address"].str.len())
            .sort_values(
                ["legacy_key", "_len", "raw_address"],
                ascending=[True, False, True],
                kind="mergesort",
            )
            .drop_duplicates("legacy_key", keep="first")
            .rename(columns={"legacy_key": "uprn", "raw_address": "full_address"})
            .assign(historic=True)[["uprn", "full_address", "historic"]],
            batch_format="pandas",
            batch_size=None,
        )
