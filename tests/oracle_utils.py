"""Shared query-vs-DuckDB-oracle helpers (one copy; the per-file
duplicates were hoisted here).  ``duck_oracle`` registers EVERY test
table — unused views cost nothing and no caller has to keep a list in
sync."""

from __future__ import annotations

import os

import duckdb
import pandas as pd

ALL_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def canon_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Column-sorted, 6-dp-rounded, row-sorted canonical form — the same
    normalization the driver's value-hash compare applies."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def duck_oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ALL_TABLES:
        path = os.path.join(sf_dir, t + ".parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con.execute(sql).df()
