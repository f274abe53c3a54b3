"""D5 — threshold tuner: sweep decision thresholds over scored pairs
against labeled match/non-match pairs, reporting precision/recall/F1 per
threshold.

Reference: internal/engine/threshold_tuner.go:37-272 (evaluates
candidate thresholds against known-good matches — the evolving gold set,
ADDRESS_MATCHING_ALGORITHM.md:515-524).  Offline utility over the
scored-pairs checkpoint: the labeled set is small by construction, so
the sweep joins scores to labels distributed, then evaluates the
threshold grid on the collected (score, is_match) columns driver-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def collect_scored_labels(
    scored_ds: rd.Dataset,
    labeled_ds: rd.Dataset,
    num_partitions: int = 8,
) -> pd.DataFrame:
    """Join scored pairs to labeled pairs on the unordered (a, b) key;
    labeled pairs the blocker never co-blocked get score 0 (they were
    never candidates — the 'at the same blocking key' clause)."""

    # id-keyed scored pairs (the flagship path) carry int64 ids =
    # url_to_node_id(url); the labeled urls hash through the same
    # fingerprint so the unordered pair keys line up
    id_mode = "id_a" in scored_ds.schema().names

    def key_scored(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        a_col, b_col = ("id_a", "id_b") if id_mode else ("url_a", "url_b")
        lo = pc.min_element_wise(b[a_col], b[b_col])
        hi = pc.max_element_wise(b[a_col], b[b_col])
        if id_mode:
            lo = pc.cast(lo, pa.string())
            hi = pc.cast(hi, pa.string())
        return pa.table(
            {
                "pair_key": pc.binary_join_element_wise(lo, hi, "\x1f"),
                "score": b["score"],
            }
        )

    def key_labeled(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if id_mode:
            import numpy as np

            from ..stages.cluster import url_to_node_id

            ia = url_to_node_id(b["url_a"].to_pylist())
            ib = url_to_node_id(b["url_b"].to_pylist())
            lo = pa.array(np.minimum(ia, ib).astype(str), pa.string())
            hi = pa.array(np.maximum(ia, ib).astype(str), pa.string())
        else:
            lo = pc.min_element_wise(b["url_a"], b["url_b"])
            hi = pc.max_element_wise(b["url_a"], b["url_b"])
        return pa.table(
            {
                "pair_key": pc.binary_join_element_wise(lo, hi, "\x1f"),
                "is_match": b["is_match"],
            }
        )

    sk = scored_ds.map_batches(key_scored, batch_format="pyarrow")
    lk = labeled_ds.map_batches(key_labeled, batch_format="pyarrow")
    joined = lk.join(sk, join_type="left_outer", num_partitions=num_partitions, on=("pair_key",))
    df = joined.to_pandas()
    df["score"] = df["score"].fillna(0.0)
    return df[["score", "is_match"]]


def sweep_thresholds(
    scored_labels: pd.DataFrame,
    thresholds: np.ndarray | None = None,
) -> pd.DataFrame:
    """Vectorized precision/recall/F1 per candidate threshold
    (threshold_tuner.go:83-244)."""
    if thresholds is None:
        thresholds = np.round(np.arange(0.50, 0.99, 0.01), 2)
    s = scored_labels["score"].to_numpy()
    y = scored_labels["is_match"].to_numpy().astype(bool)
    rows = []
    for t in thresholds:
        pred = s >= t
        tp = int((pred & y).sum())
        fp = int((pred & ~y).sum())
        fn = int((~pred & y).sum())
        p = tp / (tp + fp) if tp + fp else 0.0
        r = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * p * r / (p + r) if p + r else 0.0
        rows.append({"threshold": float(t), "tp": tp, "fp": fp, "fn": fn,
                     "precision": round(p, 4), "recall": round(r, 4), "f1": round(f1, 4)})
    return pd.DataFrame(rows)


def best_threshold(sweep: pd.DataFrame, min_precision: float = 0.98) -> float:
    """The reference's operating point: highest-F1 threshold whose
    precision clears the auto-accept bar (>=98%,
    docs/llpg_thesis/11_results_and_statistics.md:320-324)."""
    ok = sweep[sweep["precision"] >= min_precision]
    if len(ok) == 0:
        return float(sweep.loc[sweep["f1"].idxmax(), "threshold"])
    return float(ok.loc[ok["f1"].idxmax(), "threshold"])
