"""Unit tests for the task-based keyed exchange and hash join
(rayutil._partition_by_key_tasks / task_join / engine_join) — the
substrate every keyed stage rides on.  Semantics are checked against
DuckDB on data with duplicate keys, empty sides, and many small blocks
(the ref-grouping path)."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from ehdc_llpg_address_matching_ray.rayutil import (
    anti_join,
    partition_by_key,
    task_join,
)


def _mk(n: int, seed: int, key_mod: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "k": pa.array((rng.integers(0, key_mod, n)).astype("int64")),
            "s": pa.array([f"s{i}" for i in rng.integers(0, 50, n)]),
            "v": pa.array(rng.random(n)),
        }
    )


def _sorted_df(t):
    df = t.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


class TestPartitionByKey:
    def test_all_rows_present_and_keys_colocated(self, ray_session):
        t = _mk(5000, 1, 97)
        ds = rd.from_arrow(t).repartition(40)  # many small blocks -> grouped packs
        out = partition_by_key(ds, ["k"], 8, sort=False)
        blocks = [b for b in out.iter_batches(batch_size=None, batch_format="pyarrow")]
        total = sum(b.num_rows for b in blocks)
        assert total == 5000
        # every key appears in exactly one output block
        seen: dict[int, int] = {}
        for bi, b in enumerate(blocks):
            for k in set(b["k"].to_pylist()):
                assert seen.setdefault(k, bi) == bi, f"key {k} split across blocks"
        # content identical to input
        merged = pa.concat_tables(blocks)
        assert _sorted_df(merged).equals(_sorted_df(t))

    def test_sorted_within_block(self, ray_session):
        t = _mk(2000, 2, 37)
        out = partition_by_key(rd.from_arrow(t), ["k"], 4, sort=True)
        for b in out.iter_batches(batch_size=None, batch_format="pyarrow"):
            ks = b["k"].to_pylist()
            assert ks == sorted(ks)


class TestTaskJoin:
    @pytest.mark.parametrize("how,duck", [("inner", "JOIN"), ("left_outer", "LEFT JOIN")])
    def test_matches_duckdb_with_duplicate_keys(self, ray_session, how, duck):
        left = _mk(3000, 3, 50)
        right = pa.table(
            {
                "k": pa.array(np.arange(0, 40, dtype="int64").repeat(2)),  # dup right keys
                "r": pa.array([f"r{i}" for i in range(80)]),
            }
        )
        out = task_join(
            rd.from_arrow(left).repartition(17),
            rd.from_arrow(right).repartition(5),
            ("k",),
            how=how,
            num_partitions=6,
        )
        got = _sorted_df(pa.concat_tables(
            list(out.iter_batches(batch_size=None, batch_format="pyarrow"))
        ))
        con = duckdb.connect()
        con.register("l", left.to_pandas())
        con.register("r", right.to_pandas())
        exp = con.execute(
            f"SELECT l.k, l.s, l.v, r.r FROM l {duck} r USING (k)"
        ).df()
        exp = exp.sort_values(list(exp.columns)).reset_index(drop=True)
        assert len(got) == len(exp)
        assert got["k"].equals(exp["k"].astype("int64"))
        got_r = got["r"].fillna("__null__")
        exp_r = exp["r"].fillna("__null__")
        assert sorted(got_r) == sorted(exp_r)

    def test_anti_join_semantics(self, ray_session):
        left = _mk(1000, 4, 30)
        right = pa.table({"k": pa.array(np.arange(0, 15, dtype="int64"))})
        out = task_join(
            rd.from_arrow(left), rd.from_arrow(right), ("k",), how="anti", num_partitions=4
        )
        got = pa.concat_tables(list(out.iter_batches(batch_size=None, batch_format="pyarrow")))
        assert set(got["k"].to_pylist()) == {
            k for k in left["k"].to_pylist() if k >= 15
        }
        assert got.num_rows == sum(1 for k in left["k"].to_pylist() if k >= 15)

    def test_empty_right_side(self, ray_session):
        left = _mk(100, 5, 10)
        empty = pa.table({"k": pa.array([], pa.int64()), "r": pa.array([], pa.string())})
        out = task_join(
            rd.from_arrow(left), rd.from_arrow(empty), ("k",), how="inner", num_partitions=4
        )
        assert out.count() == 0
        out2 = task_join(
            rd.from_arrow(left), rd.from_arrow(empty), ("k",), how="anti", num_partitions=4
        )
        assert out2.count() == 100

    def test_string_types_survive_roundtrip(self, ray_session):
        """polars rewrites string -> large_string; task_join must cast back."""
        left = pa.table({"k": pa.array(["a", "b", "c"]), "x": pa.array([1, 2, 3], pa.int64())})
        right = pa.table({"k": pa.array(["b", "c", "d"]), "y": pa.array([9, 8, 7], pa.int64())})
        out = task_join(
            rd.from_arrow(left), rd.from_arrow(right), ("k",), how="inner", num_partitions=2
        )
        t = pa.concat_tables(list(out.iter_batches(batch_size=None, batch_format="pyarrow")))
        assert t.schema.field("k").type == pa.string()
        assert set(t["k"].to_pylist()) == {"b", "c"}


class TestAntiJoinHelper:
    def test_anti_join_with_rename(self, ray_session):
        left = pa.table({"id": pa.array(["a", "b", "c", "d"]), "v": pa.array([1, 2, 3, 4], pa.int64())})
        right = pa.table({"src_id": pa.array(["b", "d"])})
        out = anti_join(
            rd.from_arrow(left), rd.from_arrow(right), key="id", right_key="src_id", num_partitions=2
        )
        t = pa.concat_tables(list(out.iter_batches(batch_size=None, batch_format="pyarrow")))
        assert set(t["id"].to_pylist()) == {"a", "c"}
