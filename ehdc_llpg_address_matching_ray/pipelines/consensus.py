"""G1 — SAFE group-consensus corrections (the precision-preserving gate
set).

Port of the reference's safe-group-consensus pass
(cmd/matcher-v2/main.go:801-870 candidate analysis, :886-1012 apply):
groups (``group_key`` = planning_app_base analogue) vote on a consensus
gazetteer id; a group's vote is only APPLIED when every safety gate
holds — this gate set is what kept the reference's precision at 99.1%:

  total_docs BETWEEN 2 AND 30
  matched_docs > 0 AND matched_docs < total_docs
  real_addresses >= 0.6 * total_docs
  planning_refs (non-real) <= 3
  address_variations (distinct first-20 chars of real addresses) <= 5
  consensus_votes >= 2
  consensus_votes >= 0.4 * matched_docs
  best consensus id NOT NULL

Members receive the consensus id at banded confidence
0.95 / 0.90 / 0.85 for votes >= 5 / >= 3 / else (main.go:966-970), and
only members that are real addresses AND (unmatched OR score < 0.5 OR
matched to a non-consensus id) are corrected (main.go:984-996).

Ray Data shape: one keyed repartition by group_key, all gate arithmetic
vectorized pandas inside the partition — no per-group Python in Ray's
map_groups path (see rayutil.py).  The tie among equal-vote ids is
broken by (votes DESC, max score DESC, id ASC); the reference's LIMIT 1
without a final key is nondeterministic, we pin id ASC (documented
divergence).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..functions import components as CP
from ..rayutil import hash_shuffle, partition_by_key


_EMPTY_GATE = {
    "src_id": pd.Series([], dtype="object"),
    "corrected_id": pd.Series([], dtype="object"),
    "group_key": pd.Series([], dtype="object"),
    "confidence": pd.Series([], dtype="float64"),
}


def _group_gate(df: pd.DataFrame) -> pd.DataFrame:
    """Per-partition: evaluate the gate set per group_key and emit
    corrections (src_id, corrected_id, group_key, confidence).

    Fully VECTORIZED (sorted-run ``np.add.reduceat`` arithmetic, the
    ``stages.decide`` kernel shape): the r2 per-group Python loop cost
    ~µs-ms per group, a real ceiling at 10⁸ groups/partition-set.  The
    only per-row Python left is ``is_real_address`` (a per-text regex,
    same cost as before).  Semantics identical to the loop; emitted row
    ORDER differs (row-major instead of group-major) — every consumer
    is order-insensitive."""
    n = len(df)
    if n == 0:
        return pd.DataFrame(_EMPTY_GATE)
    m_score = df["m_score"].fillna(0.0).to_numpy(dtype=np.float64)
    matched_id = df["matched_id"].fillna("").to_numpy(dtype=object)
    raw = df["raw_address"].to_numpy(dtype=object)
    is_real = np.fromiter((CP.is_real_address(t or "") for t in raw), bool, n)
    gk = df["group_key"].to_numpy(dtype=object)

    codes, _ = pd.factorize(gk, sort=False)
    G = int(codes.max()) + 1
    order = np.argsort(codes, kind="stable")
    c = codes[order]
    starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
    run_code = c[starts]  # == arange(G) for factorize codes, kept explicit
    total = np.diff(np.r_[starts, n])
    ms = m_score[order]
    ir = is_real[order]
    matched = np.add.reduceat((ms > 0).astype(np.int64), starts)
    real = np.add.reduceat(ir.astype(np.int64), starts)

    # address variations: distinct 20-char prefixes among REAL rows
    variations = np.zeros(G, dtype=np.int64)
    rm = np.flatnonzero(ir)
    if len(rm):
        pref = np.fromiter(((raw[i] or "")[:20] for i in rm), object, len(rm))
        pcode, _ = pd.factorize(pref, sort=False)
        pair = codes[rm].astype(np.int64) * (int(pcode.max()) + 1) + pcode
        up = np.unique(pair)
        np.add.at(variations, (up // (int(pcode.max()) + 1)), 1)

    # vote tally per (group, matched_id): votes=count, best=max score;
    # winner per group by (votes DESC, best DESC, id ASC) — ``sort=True``
    # factorize makes smaller mid_code == lexicographically smaller id
    votes_g = np.zeros(G, dtype=np.int64)
    best_mid = np.full(G, "", dtype=object)
    vm = (m_score > 0.5) & (matched_id != "")
    vi = np.flatnonzero(vm)
    if len(vi):
        mid_code, mid_uniq = pd.factorize(matched_id[vi], sort=True)
        M = len(mid_uniq)
        key = codes[vi].astype(np.int64) * M + mid_code
        korder = np.argsort(key, kind="stable")
        ks = key[korder]
        kstarts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        t_votes = np.diff(np.r_[kstarts, len(ks)])
        t_best = np.maximum.reduceat(m_score[vi][korder], kstarts)
        t_g = ks[kstarts] // M
        t_mid = ks[kstarts] % M
        w = np.lexsort((t_mid, -t_best, -t_votes, t_g))
        t_g_w = t_g[w]
        first = np.flatnonzero(np.r_[True, t_g_w[1:] != t_g_w[:-1]])
        win = w[first]
        votes_g[t_g[win]] = t_votes[win]
        best_mid[t_g[win]] = mid_uniq.to_numpy(dtype=object)[t_mid[win]] if hasattr(
            mid_uniq, "to_numpy"
        ) else np.asarray(mid_uniq, dtype=object)[t_mid[win]]

    ok_run = (
        (total >= 2)
        & (total <= 30)
        & (matched > 0)
        & (matched < total)
        & (real >= total * 0.6)
        & ((total - real) <= 3)
        & (variations[run_code] <= 5)
        & (votes_g[run_code] >= 2)
        & (votes_g[run_code] >= matched * 0.4)
    )
    ok_g = np.zeros(G, dtype=bool)
    ok_g[run_code] = ok_run
    matched_g = np.zeros(G, dtype=np.int64)
    matched_g[run_code] = matched

    conf_g = np.where(votes_g >= 5, 0.95, np.where(votes_g >= 3, 0.90, 0.85))
    row_best = best_mid[codes]
    sel = (
        ok_g[codes]
        & is_real
        & ((m_score < 0.5) | (matched_id == "") | (matched_id != row_best))
    )
    si = np.flatnonzero(sel)
    if not len(si):
        return pd.DataFrame(_EMPTY_GATE)
    return pd.DataFrame(
        {
            "src_id": pd.Series(df["src_id"].to_numpy(dtype=object)[si], dtype="object"),
            "corrected_id": pd.Series(row_best[si], dtype="object"),
            "group_key": pd.Series(gk[si], dtype="object"),
            "confidence": pd.Series(conf_g[codes[si]], dtype="float64"),
        }
    )


def group_consensus_corrections(
    sources_ds: rd.Dataset,
    matches_ds: rd.Dataset,
    source_id: str = "src_id",
    source_text: str = "raw_address",
    group_col: str = "group_key",
    num_partitions: int = 8,
) -> rd.Dataset:
    """sources (id, text, group) × matches (src_id, matched_id, score) ->
    SAFE consensus corrections, apply-ready for
    ``corrections.apply_corrections``.

    One left_outer join + one keyed repartition by group_key; every gate
    is evaluated inside the partition.
    """
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
        m = matches_ds.map_batches(
            lambda b: pa.table(
                {
                    "m_src": b["src_id"],
                    "matched_id": b["matched_id"],
                    "m_score": b["score"],
                }
            ),
            batch_format="pyarrow",
        )
        j = src.join(
            m, join_type="left_outer", num_partitions=num_partitions,
            on=("src_id",), right_on=("m_src",),
        )
        return partition_by_key(j, ["group_key"], num_partitions, sort=False).map_batches(
            _group_gate, batch_format="pandas", batch_size=None
        )
