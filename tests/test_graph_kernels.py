"""Property tests for the round-3 pure kernels: synthetic edge
generation vs a naive per-node reference, and the sequence-pack shard
cumsum vs a scalar loop."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from ehdc_llpg_address_matching_ray.pipelines.queries import _PACK_CAP, _synth_edges


def _naive_edges(doc_ids: list[int], n: int) -> set[tuple[int, int]]:
    out = set()
    for u in doc_ids:
        for j in range(u % 3 + 1):
            d = (u * 37 + j * j * 101 + 13) % n
            if d == u:
                d = (d + 1) % n
            out.add((u, d))
    return out


@given(
    st.integers(min_value=2, max_value=400).flatmap(
        lambda n: st.lists(
            st.integers(min_value=0, max_value=n - 1), min_size=1, max_size=60, unique=True
        ).map(lambda ids: (n, ids))
    )
)
@settings(max_examples=200, deadline=None)
def test_synth_edges_matches_naive(case):
    n, ids = case
    b = pa.table({"doc_id": pa.array(sorted(ids), pa.int64())})
    es, ed, deg = _synth_edges(b, n)
    got = set(zip(es.tolist(), ed.tolist()))
    want = _naive_edges(ids, n)
    assert got == want
    # deg column = out-degree of each edge's source, repeated per edge
    ref = pd.Series(es).value_counts()
    assert (deg == ref.loc[es].to_numpy()).all()


def _naive_pack(shards: list[int], toks: list[int]) -> list[int]:
    run: dict[int, int] = {}
    out = []
    for s, t in sorted(zip(shards, toks), key=lambda x: (x[0],)):
        start = run.get(s, 0)
        out.append(start // _PACK_CAP)
        run[s] = start + t
    return out


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=1, max_value=300),
        ),
        min_size=1,
        max_size=80,
    )
)
@settings(max_examples=200, deadline=None)
def test_pack_cumsum_matches_scalar_loop(rows):
    # mirror pack()'s vectorized shard-boundary restart on synthetic rows
    df = (
        pd.DataFrame(rows, columns=["shard", "n_tokens"])
        .sort_values("shard", kind="mergesort")
        .reset_index(drop=True)
    )
    tok = df["n_tokens"].to_numpy()
    cum = np.cumsum(tok) - tok
    sh = df["shard"].to_numpy()
    chg = np.r_[True, sh[1:] != sh[:-1]]
    base = np.maximum.accumulate(np.where(chg, cum, 0))
    got = ((cum - base) // _PACK_CAP).tolist()
    assert got == _naive_pack(df["shard"].tolist(), tok.tolist())
