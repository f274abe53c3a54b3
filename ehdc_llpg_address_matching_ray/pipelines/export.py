"""S4 — enhanced per-source-type exporter.

Port of internal/engine/exporter.go:60-440: every source document gains
derived columns —

  Address_Quality   GOOD/FAIR/POOR   (exporter.go:222-268: +2 len>=15 /
                    +1 len>=8, +2 postcode, +2 coordinates, +1 any
                    digit; POOR when trimmed len<=3 or 'N A'; GOOD>=6,
                    FAIR>=3)
  Match_Status      MATCHED/UNMATCHED/NEEDS_REVIEW (exporter.go:271-281:
                    matched + score<0.70 -> NEEDS_REVIEW)
  Coordinate_Distance  Euclidean metres between source and gazetteer
                    coordinates when both present (exporter.go:284-297)
  Address_Similarity   token-Jaccard between canonical source address
                    and matched gazetteer address (exporter.go:300-340's
                    no-database fallback branch; the SQL branch calls
                    pg_trgm similarity(), unavailable without Postgres —
                    documented divergence)

and the result is written as one CSV per source_type
(``enhanced_<type>_results.csv``), the reference's main human
deliverable.

Ray Data shape: two left_outer joins (matches, gazetteer payload) + one
vectorized map_batches for every derived column; the per-type split
enumerates the distinct source types (a handful by construction) and
filter-writes each — each write streams, nothing materializes on the
driver.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..rayutil import hash_shuffle


def _address_quality(raw: pd.Series, postcode: pd.Series, has_coords: pd.Series) -> pd.Series:
    raw = raw.fillna("")
    n = raw.str.len()
    score = np.zeros(len(raw), dtype=np.int64)
    score += np.where(n >= 15, 2, np.where(n >= 8, 1, 0))
    score += np.where(postcode.fillna("").str.len() > 0, 2, 0)
    score += np.where(has_coords, 2, 0)
    score += np.where(raw.str.contains(r"[0-9]", regex=True), 1, 0)
    out = np.where(score >= 6, "GOOD", np.where(score >= 3, "FAIR", "POOR"))
    trimmed = raw.str.strip()
    poor = (trimmed.str.len() <= 3) | (trimmed.str.upper() == "N A")
    return pd.Series(np.where(poor, "POOR", out), index=raw.index)


def _token_jaccard(a: str, b: str) -> float:
    """exporter.go:316-340 fallback similarity: matched words over the
    union (|A| + |B| - matches)."""
    sw = (a or "").upper().strip().split()
    tw = (b or "").upper().strip().split()
    if (a or "").upper().strip() == (b or "").upper().strip():
        return 1.0
    matches = 0
    used = [False] * len(tw)
    for s in sw:
        for j, t in enumerate(tw):
            if not used[j] and s == t:
                used[j] = True
                matches += 1
                break
    total = len(sw) + len(tw) - matches
    return matches / total if total > 0 else 0.0


def enhance_matches(
    sources_ds: rd.Dataset,
    matches_ds: rd.Dataset,
    gazetteer_ds: rd.Dataset,
    source_id: str = "src_id",
    source_text: str = "raw_address",
    source_type_col: str = "source_type",
    postcode_col: str | None = None,
    easting_col: str | None = None,
    northing_col: str | None = None,
    gaz_id: str = "uprn",
    gaz_text: str = "full_address",
    gaz_easting: str | None = None,
    gaz_northing: str | None = None,
    num_partitions: int = 8,
) -> rd.Dataset:
    """sources ⟕ matches ⟕ gazetteer → enhanced document Dataset with the
    exporter's derived columns."""
    with hash_shuffle():
        def src_proj(b: pa.Table) -> pa.Table:
            cols = {
                "src_id": b[source_id].cast(pa.string()),
                "source_type": b[source_type_col].cast(pa.string()),
                "raw_address": b[source_text],
                "postcode_text": (
                    b[postcode_col].cast(pa.string())
                    if postcode_col
                    else pa.array([None] * b.num_rows, pa.string())
                ),
                "easting_raw": (
                    b[easting_col].cast(pa.float64())
                    if easting_col
                    else pa.array([None] * b.num_rows, pa.float64())
                ),
                "northing_raw": (
                    b[northing_col].cast(pa.float64())
                    if northing_col
                    else pa.array([None] * b.num_rows, pa.float64())
                ),
            }
            return pa.table(cols)

        src = sources_ds.map_batches(src_proj, batch_format="pyarrow").materialize()

        m = matches_ds.map_batches(
            lambda b: pa.table(
                {
                    "m_src": b["src_id"],
                    "matched_uprn": b["matched_id"],
                    "match_method": b["method"],
                    "match_score": b["score"],
                }
            ),
            batch_format="pyarrow",
        )
        j = src.join(
            m, join_type="left_outer", num_partitions=num_partitions,
            on=("src_id",), right_on=("m_src",),
        ).materialize()
        n = j.count()
        j = j.repartition(max(1, min(num_partitions, n))).materialize()

        def gaz_proj(b: pa.Table) -> pa.Table:
            cols = {
                "g_id": b[gaz_id].cast(pa.string()),
                "llpg_address": b[gaz_text],
                "llpg_easting": (
                    b[gaz_easting].cast(pa.float64())
                    if gaz_easting
                    else pa.array([None] * b.num_rows, pa.float64())
                ),
                "llpg_northing": (
                    b[gaz_northing].cast(pa.float64())
                    if gaz_northing
                    else pa.array([None] * b.num_rows, pa.float64())
                ),
            }
            return pa.table(cols)

        gaz = gazetteer_ds.map_batches(gaz_proj, batch_format="pyarrow")
        j = j.join(
            gaz, join_type="left_outer", num_partitions=num_partitions,
            on=("matched_uprn",), right_on=("g_id",),
        )

        def derive(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                df = df.copy()
                for c, dt in (
                    ("address_quality", "object"),
                    ("match_status", "object"),
                    ("coordinate_distance", "float64"),
                    ("address_similarity", "float64"),
                ):
                    df[c] = pd.Series([], dtype=dt)
                return df
            df = df.copy()
            has_coords = df["easting_raw"].notna() & df["northing_raw"].notna()
            df["address_quality"] = _address_quality(
                df["raw_address"], df["postcode_text"], has_coords
            )
            matched = df["matched_uprn"].fillna("") != ""
            score = df["match_score"].fillna(0.0)
            df["match_status"] = np.where(
                matched, np.where(score < 0.70, "NEEDS_REVIEW", "MATCHED"), "UNMATCHED"
            )
            both = (
                has_coords & df["llpg_easting"].notna() & df["llpg_northing"].notna()
            )
            dx = df["llpg_easting"] - df["easting_raw"]
            dy = df["llpg_northing"] - df["northing_raw"]
            df["coordinate_distance"] = np.where(both, np.sqrt(dx * dx + dy * dy), np.nan)
            df["address_similarity"] = [
                _token_jaccard(a, b) if m else np.nan
                for a, b, m in zip(df["raw_address"], df["llpg_address"], matched)
            ]
            return df

        return j.map_batches(derive, batch_format="pandas")


def export_enhanced_csvs(
    enhanced_ds: rd.Dataset,
    output_dir: str,
    source_type_col: str = "source_type",
) -> dict[str, int]:
    """One ``enhanced_<type>_results.csv`` directory per source type
    (exporter.go:123-167).  The type set is enumerated from the data (a
    handful of values by construction); each per-type subset streams to
    its own CSV partition directory — resumable, never one giant file.
    Returns {source_type: row_count}."""
    os.makedirs(output_dir, exist_ok=True)
    enhanced_ds = enhanced_ds.materialize()
    types = sorted(
        {
            t
            for b in enhanced_ds.select_columns([source_type_col]).iter_batches(
                batch_size=8192, batch_format="pyarrow"
            )
            for t in b[source_type_col].unique().to_pylist()
        }
    )
    counts: dict[str, int] = {}
    for t in types:
        sub = enhanced_ds.filter(expr=f"{source_type_col} == {t!r}")
        path = os.path.join(output_dir, f"enhanced_{t}_results.csv")
        sub = sub.materialize()
        counts[t] = sub.count()
        if counts[t]:
            sub.write_csv(path)
    return counts
