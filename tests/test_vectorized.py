"""Parity gates for the round-2 vectorized hot paths: each batched
kernel must be value-identical (or exactly set-identical) to the scalar
port it replaced — the scalar stays as the oracle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ehdc_llpg_address_matching_ray.config import BlockingConfig
from ehdc_llpg_address_matching_ray.functions import minhash as MH
from ehdc_llpg_address_matching_ray.functions import strings as S
from ehdc_llpg_address_matching_ray.stages.blocking import enumerate_block_pairs
from ehdc_llpg_address_matching_ray.stages.scoring import PairScorer


def _synthetic_texts(n: int, seed: int = 0) -> list[str]:
    rng = np.random.RandomState(seed)
    words = [
        "".join(chr(65 + rng.randint(26)) for _ in range(rng.randint(2, 9))) for _ in range(300)
    ]
    out = []
    for _ in range(n):
        out.append(" ".join(words[rng.randint(300)] for _ in range(rng.randint(1, 9))))
    return out


class TestBatchBandKeysChar:
    def test_parity_with_scalar_loop(self):
        a, b = MH.make_perms(32, 42)
        texts = _synthetic_texts(700) + ["", "a", "ab", "abc", "  ", "一丁二", "x" * 200]
        ref = MH.batch_band_keys(texts, a, b, 8)
        vec = MH.batch_band_keys_char(texts, a, b, 8)
        assert np.array_equal(ref, vec)

    def test_chunk_boundary_parity(self):
        a, b = MH.make_perms(16, 7)
        texts = _synthetic_texts(MH._BBK_CHUNK + 3, seed=5)
        ref = MH.batch_band_keys(texts, a, b, 4)
        vec = MH.batch_band_keys_char(texts, a, b, 4)
        assert np.array_equal(ref, vec)


class TestBatchSignaturesChar:
    def test_parity_with_scalar_signature(self):
        a, b = MH.make_perms(8, 7)
        texts = _synthetic_texts(50, seed=3) + ["", "a", "ab", "abc", "x" * 100]
        vec = MH.batch_signatures_char(texts, a, b, 3)
        for i, t in enumerate(texts):
            ref = MH.minhash_signature(MH.char_shingles(t, 3), a, b)
            assert np.array_equal(vec[i], ref), t

    def test_sql_twin_value_exact(self):
        """The generated DuckDB oracle reproduces the kernel bit-for-bit
        on edge cases: empty text, NULL, 1/2-char pads, unicode strip."""
        import duckdb
        import pandas as pd

        from ehdc_llpg_address_matching_ray.pipelines.queries import (
            _MH_SIG_NUM_PERM,
            _MH_SIG_SEED,
            SQL_MINHASH_SIGS,
        )

        texts = [
            "the quick brown fox jumps over the lazy dog",
            "",
            None,
            "a",
            "ab",
            "abc",
            "héllo wörld one — two",  # non-ASCII stripped on both sides
            "repeat repeat repeat repeat",
        ]
        con = duckdb.connect()
        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        con.register("documents", df)
        got = (
            con.execute(SQL_MINHASH_SIGS)
            .df()
            .sort_values(["doc_id", "perm_idx"])
            .reset_index(drop=True)
        )

        import re

        a, b = MH.make_perms(_MH_SIG_NUM_PERM, _MH_SIG_SEED)
        clean = [re.sub(r"[^\x20-\x7e]", "", t or "") for t in texts]
        sig = MH.batch_signatures_char(clean, a, b, 3).astype(np.int64)
        assert np.array_equal(got["sig"].to_numpy(), sig.reshape(-1))


class TestJaroWinklerChunking:
    def test_chunked_equals_unchunked(self):
        texts_a = _synthetic_texts(S._JW_CHUNK + 100, seed=1)
        texts_b = [t[: max(1, len(t) - 3)] + "XY" for t in texts_a]
        full = S.jaro_winkler_batch(texts_a, texts_b)
        for i in range(0, len(texts_a), 911):
            assert full[i] == S.jaro_winkler(texts_a[i], texts_b[i])


def _naive_enumerate(batch: pa.Table, cfg: BlockingConfig):
    """Reference per-block loop (the pre-vectorization algorithm)."""
    order = pc.sort_indices(
        batch.select(["block_key", "url"]),
        sort_keys=[("block_key", "ascending"), ("url", "ascending")],
    )
    batch = batch.take(order)
    nk = sum(1 for c in batch.column_names if c.startswith("k"))
    bk = batch["block_key"].to_numpy()
    K = np.stack([batch[f"k{j:02d}"].to_numpy() for j in range(nk)], axis=1)
    boundaries = np.flatnonzero(np.diff(bk)) + 1
    starts = np.concatenate([[0], boundaries])
    ends = np.concatenate([boundaries, [len(bk)]])
    cap = cfg.max_block_size
    urls = batch["url"].to_pylist()
    pairs = set()
    dropped = 0
    for s, e in zip(starts, ends):
        m = e - s
        if m < 2:
            continue
        if m <= cap:
            iu, il = np.triu_indices(m, k=1)
        else:
            iu_l, il_l = [], []
            kept = 0
            for cs in range(0, m, cap):
                cm = min(cap, m - cs)
                if cm < 2:
                    continue
                a_, b_ = np.triu_indices(cm, k=1)
                iu_l.append(a_ + cs)
                il_l.append(b_ + cs)
                kept += cm * (cm - 1) // 2
            iu = np.concatenate(iu_l) if iu_l else np.empty(0, dtype=int)
            il = np.concatenate(il_l) if il_l else np.empty(0, dtype=int)
            dropped += m * (m - 1) // 2 - kept
        if len(iu) == 0:
            continue
        Ka, Kb = K[s + iu], K[s + il]
        shared = Ka == Kb
        cur = ((Ka == bk[s]) & (Kb == bk[s])).argmax(axis=1)
        keep = shared.argmax(axis=1) == cur
        for x, y in zip((s + iu)[keep], (s + il)[keep]):
            pairs.add((urls[x], urls[y]))
    return pairs, dropped


class TestEnumerateBlockPairsVectorized:
    def _batch(self, n: int, nk: int, nkeys: int, hot: int, seed: int) -> pa.Table:
        rng = np.random.RandomState(seed)
        K = rng.randint(0, nkeys, (n, nk)).astype(np.int64)
        bkcol = K[np.arange(n), rng.randint(0, nk, n)]
        if hot:
            bkcol[:hot] = 999_999
            K[:hot, 0] = 999_999
        cols = {
            "block_key": pa.array(bkcol),
            "url": pa.array([f"u{i:06d}" for i in rng.permutation(n)]),
        }
        for j in range(nk):
            cols[f"k{j:02d}"] = pa.array(K[:, j])
        return pa.table(cols)

    def test_set_identical_to_naive(self):
        cfg = BlockingConfig()
        batch = self._batch(20000, 10, 2500, hot=0, seed=0)
        ref_pairs, ref_drop = _naive_enumerate(batch, cfg)
        out = enumerate_block_pairs(batch, cfg)
        got = set(zip(out["url_a"].to_pylist(), out["url_b"].to_pylist())) - {("", "")}
        assert got == ref_pairs
        assert int(pc.sum(out["dropped_pairs"]).as_py() or 0) == ref_drop == 0

    def test_oversized_blocks_account_drops(self):
        cfg = BlockingConfig()
        batch = self._batch(3000, 10, 60, hot=300, seed=1)
        ref_pairs, ref_drop = _naive_enumerate(batch, cfg)
        out = enumerate_block_pairs(batch, cfg)
        got = set(zip(out["url_a"].to_pylist(), out["url_b"].to_pylist())) - {("", "")}
        assert got == ref_pairs
        assert ref_drop > 0
        assert int(pc.sum(out["dropped_pairs"]).as_py() or 0) == ref_drop

    def test_empty_input(self):
        cfg = BlockingConfig()
        empty = pa.table(
            {
                "block_key": pa.array([], pa.int64()),
                "url": pa.array([], pa.string()),
                **{f"k{j:02d}": pa.array([], pa.int64()) for j in range(10)},
            }
        )
        assert enumerate_block_pairs(empty, cfg).num_rows == 0


class TestBatchedTsTf:
    def test_parity_with_scalar_pair_functions(self):
        rng = np.random.RandomState(3)
        texts = _synthetic_texts(400, seed=3)
        ia = rng.randint(0, len(texts), 3000)
        ib = (ia + rng.randint(0, 4, 3000)) % len(texts)
        ca = [texts[i] for i in ia]
        cb = [texts[i] for i in ib]
        # edge cases: empties and identicals
        ca[0] = cb[0] = ""
        ca[1] = ""
        cb[2] = ca[2]
        sc = PairScorer(idf={"THE": 2.0}, n_docs=100)
        ts_v, tf_v = sc._ts_tf_batch(ca, cb)
        ts_s = np.array([sc._overlap_pair(a, b) for a, b in zip(ca, cb)])
        tf_s = np.array([sc._tfidf_pair(a, b) for a, b in zip(ca, cb)])
        assert np.abs(ts_v - ts_s).max() == 0.0
        assert np.abs(tf_v - tf_s).max() < 1e-12


class TestCsrScorerParity:
    """Round-4 CSR fast path (build_payload_index + _score_csr) vs the
    per-text-cached path: every output column must match on adversarial
    payloads — empty canonicals, double spaces (empty tokens), digit
    tokens, DL-1-distance typos, unicode, house/locality extractions,
    salting sentinels (-1) and dangling ids."""

    def _payload(self):
        import ray

        from ehdc_llpg_address_matching_ray.stages import scoring as SC

        rng = np.random.RandomState(7)
        words = [
            "street", "stret", "orchard", "orchord", "monks", "lane", "the",
            "a1", "12", "héllo", "wörld", "grove", "grove,", "park", "road",
            "rode", "house", "big", "xx", "yyy", "zzzz", "12a", "ab3",
        ]
        texts = []
        for i in range(180):
            toks = [words[rng.randint(0, len(words))] for _ in range(rng.randint(0, 9))]
            t = " ".join(toks)
            if i % 17 == 0:
                t = t + "  double"  # double space -> empty token
            if i % 31 == 0:
                t = ""
            texts.append(t)
        t = pa.table(
            {
                "url": pa.array([f"http://s{i}.example/p" for i in range(len(texts))]),
                "text": pa.array(
                    [
                        f"{rng.randint(1, 30)} MONKS ORCHARD {x}" if i % 3 else x
                        for i, x in enumerate(texts)
                    ]
                ),
                "canonical": pa.array(texts),
            }
        )
        return SC.enrich_payload(t), rng

    def test_all_columns_match_reference_path(self):
        import ray

        from ehdc_llpg_address_matching_ray.stages import scoring as SC

        t, rng = self._payload()
        nids = t["nid"].to_numpy()
        idf = {"street": 2.0, "the": 0.5, "orchard": 3.0}
        old = SC.PairScorer(idf=idf, n_docs=400, payload=[ray.put(t)])
        new = SC.PairScorer(
            idf=idf, n_docs=400, payload=[ray.put(SC.build_payload_index(idf, 400, t))]
        )
        assert new._csr is not None
        ia = nids[rng.randint(0, len(nids), 3000)].copy()
        ib = nids[rng.randint(0, len(nids), 3000)].copy()
        ia[:5] = -1  # salting sentinels
        ib[5:10] = 999_999  # dangling ids
        ia[10] = ib[10]
        batch = pa.table(
            {
                "id_a": pa.array(ia, pa.int64()),
                "id_b": pa.array(ib, pa.int64()),
                "dropped_pairs": pa.array(np.zeros(len(ia), np.int64)),
            }
        )
        r_old, r_new = old(batch), new(batch)
        assert r_old.column_names == r_new.column_names
        for c in r_old.column_names:
            a = r_old[c].to_numpy(zero_copy_only=False)
            b = r_new[c].to_numpy(zero_copy_only=False)
            if a.dtype.kind == "f":
                assert np.abs(a - b).max() < 1e-12, c
            else:
                assert np.array_equal(a, b), c

    def test_empty_batch_and_empty_payload(self):
        import ray

        from ehdc_llpg_address_matching_ray.stages import scoring as SC

        t, _ = self._payload()
        new = SC.PairScorer(
            n_docs=400, payload=[ray.put(SC.build_payload_index({}, 400, t))]
        )
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
        )
        out = new(empty)
        assert out.num_rows == 0 and "score" in out.column_names
        # 0-row payload -> no index, graceful fallthrough
        tbl, idx = SC.build_payload_index({}, 1, t.slice(0, 0))
        assert idx is None and tbl.num_rows == 0
