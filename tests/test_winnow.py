"""Winnowing fingerprint kernel (queries.winnow_batch / winnow_select):
parity against a naive per-doc reference implementation of Schleimer et
al. 2003 (min per window, rightmost tie-break), plus edge shapes."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ehdc_llpg_address_matching_ray.pipelines.queries import (
    _WINNOW_K,
    _WINNOW_W,
    winnow_batch,
    winnow_select,
)


def naive_winnow(text: str, k: int, w: int) -> set[tuple[int, str]]:
    """Literal per-doc reference: md5 every char k-gram, slide a window
    of w hashes, keep the min (rightmost position on ties)."""
    n_g = len(text) - k + 1
    if n_g < w:
        return set()
    hs = [hashlib.md5(text[i : i + k].encode("utf-8")).hexdigest() for i in range(n_g)]
    picks: set[tuple[int, str]] = set()
    for j in range(n_g - w + 1):
        win = hs[j : j + w]
        m = min(win)
        # rightmost occurrence of the minimum
        p = j + max(i for i, h in enumerate(win) if h == m)
        picks.add((p + 1, hs[p]))  # 1-based position
    return picks


def run_batch(texts: list[str]) -> pd.DataFrame:
    b = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts})
    return winnow_batch(b).to_pandas()


class TestWinnowSelect:
    def test_rightmost_tie_break(self):
        # window w=3 over ranks [1, 0, 0, 2]: both windows contain two
        # rank-0 grams; the RIGHTMOST one must win in each
        r = np.array([1, 0, 0, 2], np.int64)
        doc = np.zeros(4, np.int64)
        sel = winnow_select(r, doc, 3)
        assert sel.tolist() == [2]  # index 2 is the rightmost min in both windows

    def test_doc_boundary_windows_excluded(self):
        # two docs of 3 grams each, w=3: exactly one window per doc —
        # no window may span the boundary
        r = np.array([2, 0, 1, 1, 0, 2], np.int64)
        doc = np.array([0, 0, 0, 1, 1, 1], np.int64)
        sel = winnow_select(r, doc, 3)
        assert sel.tolist() == [1, 4]

    def test_short_docs_emit_nothing(self):
        r = np.array([0, 1], np.int64)
        doc = np.array([0, 1], np.int64)
        assert winnow_select(r, doc, 3).tolist() == []


class TestWinnowBatchParity:
    def test_naive_parity_mixed_docs(self):
        rng = np.random.RandomState(7)
        alpha = "abcde fgh"
        texts = [
            "".join(alpha[i] for i in rng.randint(0, len(alpha), size=n))
            for n in [0, 3, _WINNOW_K, _WINNOW_K + _WINNOW_W - 2, _WINNOW_K + _WINNOW_W - 1, 40, 200]
        ]
        # repetitive text forces hash ties inside windows
        texts.append("ababababababababababab")
        out = run_batch(texts)
        for d, t in enumerate(texts):
            got = set(
                zip(
                    out.loc[out.doc_id == d, "pos"].tolist(),
                    out.loc[out.doc_id == d, "h"].tolist(),
                )
            )
            assert got == naive_winnow(t, _WINNOW_K, _WINNOW_W), f"doc {d}: {t!r}"

    def test_non_ascii_positions_are_codepoints(self):
        # é is 2 utf-8 bytes but ONE char: positions must count chars
        # (SQL substr semantics), which the utf-32 view guarantees
        t = "héllo wörld — naïve café text!"
        out = run_batch([t])
        got = set(zip(out["pos"].tolist(), out["h"].tolist()))
        assert got == naive_winnow(t, _WINNOW_K, _WINNOW_W)

    def test_locality_guarantee(self):
        # any shared substring of length >= k + w - 1 shares a fingerprint
        rng = np.random.RandomState(11)
        alpha = "abcdefgh "
        core = "".join(alpha[i] for i in rng.randint(0, len(alpha), size=_WINNOW_K + _WINNOW_W - 1))
        a = "xxxxxxxxxxxx" + core + "yyyyyyyyyyyy"
        b = "zzzz" + core + "qqqqqqqqqqqqqqqqqqqq"
        out = run_batch([a, b])
        ha = set(out.loc[out.doc_id == 0, "h"])
        hb = set(out.loc[out.doc_id == 1, "h"])
        assert ha & hb


class TestWinnowNeardupCap:
    def test_pair_cap_bounds_hot_fingerprint(self):
        """100x blow-up of one hot fingerprint (the universal-boilerplate
        case): candidate pairs stay O(m * cap) — chunks of cap docs pair
        internally only — instead of the O(m^2) uncapped self-merge, all
        hot-bucket pairs carry capped=True, and cold buckets keep the
        exact uncapped semantics with capped=False."""
        from ehdc_llpg_address_matching_ray.pipelines.queries import (
            _WINNOW_PAIR_CAP as CAP,
            winnow_pair_part,
        )

        m = CAP * 100  # pre-fix quadratic case: C(25600, 2) ≈ 327M pairs
        hot = pd.DataFrame(
            {
                "doc_id": np.arange(m, dtype=np.int64),
                "h": "boilerplate",
                "n_fp": np.full(m, 5, np.int64),
            }
        )
        cold = pd.DataFrame(
            {
                "doc_id": np.array([7, 3, 11], np.int64),
                "h": "rare",
                "n_fp": np.full(3, 5, np.int64),
            }
        )
        out = winnow_pair_part(pd.concat([hot, cold], ignore_index=True))
        hot_pairs = out[out["capped"]]
        cold_pairs = out[~out["capped"]]
        n_chunks = m // CAP
        assert len(hot_pairs) == n_chunks * CAP * (CAP - 1) // 2
        # chunks are contiguous doc_id ranks: no pair spans >= CAP ids
        assert (hot_pairs["doc_b"] - hot_pairs["doc_a"]).max() < CAP
        # the cold bucket is below the cap: full C(3,2) pairs, uncapped
        assert sorted(map(tuple, cold_pairs[["doc_a", "doc_b"]].to_numpy())) == [
            (3, 7),
            (3, 11),
            (7, 11),
        ]

    def test_neardup_matches_oracle(self, ray_session, sf_unit_dir):
        from oracle_utils import canon_frame, duck_oracle

        from ehdc_llpg_address_matching_ray.pipelines.queries import ORACLE_SQL, QUERIES

        ray_df = canon_frame(QUERIES["winnow_neardup"](sf_unit_dir).to_pandas())
        sql_df = canon_frame(duck_oracle(sf_unit_dir, ORACLE_SQL["winnow_neardup"]))
        assert len(ray_df) == len(sql_df) > 0
        pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False)
