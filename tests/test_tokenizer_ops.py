"""Tokenizer-training / keyword operators vs their DuckDB oracles at
sf0.001: one BPE merge iteration (Sennrich et al. 2016 §3 — corpus-wide
adjacent character-pair counts over the whitespace-token stream) and
per-document TF-IDF keyword extraction.  Value-identical to the SQL
twins under the driver's canonical compare, plus semantic spot checks."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from oracle_utils import canon_frame, duck_oracle

from ehdc_llpg_address_matching_ray.pipelines.queries import ORACLE_SQL, QUERIES

OPS = ["bpe_merge_step", "keywords_tfidf"]


@pytest.mark.parametrize("name", OPS)
def test_query_matches_oracle(name, ray_session, sf_unit_dir):
    ray_df = canon_frame(QUERIES[name](sf_unit_dir).to_pandas())
    sql_df = canon_frame(duck_oracle(sf_unit_dir, ORACLE_SQL[name]))
    assert len(ray_df) == len(sql_df) > 0, name
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False)


def test_bpe_pairs_are_two_chars_and_ranked(ray_session, sf_unit_dir):
    top = QUERIES["bpe_merge_step"](sf_unit_dir).to_pandas()
    assert len(top) == 20
    assert (top["pair"].str.len() == 2).all()
    key = list(zip(-top["cnt"], top["pair"]))
    assert key == sorted(key)  # cnt DESC, pair ASC
    # the best merge candidate really is the corpus-wide argmax: its
    # count must dominate every other returned pair
    assert top["cnt"].iloc[0] == top["cnt"].max()


def test_bpe_weighted_counts_match_naive(ray_session, sf_unit_dir):
    """The vectorized distinct-token × occurrence-weight kernel equals a
    naive per-token Python count on a raw text sample."""
    import os

    import duckdb
    from collections import Counter

    con = duckdb.connect()
    texts = [
        r[0]
        for r in con.execute(
            "SELECT coalesce(text,'') FROM read_parquet('"
            + os.path.join(sf_unit_dir, "documents.parquet")
            + "') LIMIT 50"
        ).fetchall()
    ]
    naive: Counter = Counter()
    for t in texts:
        for w in t.split():
            for i in range(len(w) - 1):
                naive[w[i : i + 2]] += 1
    import pyarrow as pa

    from ehdc_llpg_address_matching_ray.pipelines.queries import q_bpe_merge_step  # noqa: F401

    # run the per-batch kernel directly (no Ray) by reaching through the
    # query's closure: rebuild the same partial here
    from ehdc_llpg_address_matching_ray.functions import textstats as TS
    import pyarrow.compute as pc

    _, codes, _, vocab = TS.flat_token_codes(pa.array(texts))
    w = np.bincount(codes, minlength=len(vocab)).astype(np.int64)
    vl = pc.utf8_length(vocab).to_numpy(zero_copy_only=False).astype(np.int64)
    cp = np.frombuffer("".join(vocab.to_pylist()).encode("utf-32-le"), dtype=np.uint32)
    ends = np.cumsum(vl)
    valid = np.ones(cp.size, dtype=bool)
    valid[ends - 1] = False
    idx = np.nonzero(valid)[0]
    tok_of = np.searchsorted(ends, idx, side="right")
    key = (cp[idx].astype(np.uint64) << np.uint64(32)) | cp[idx + 1].astype(np.uint64)
    uniq, inv = np.unique(key, return_inverse=True)
    cnt = np.bincount(inv, weights=w[tok_of].astype(np.float64)).astype(np.int64)
    got = {
        chr(int(u >> np.uint64(32))) + chr(int(u & np.uint64(0xFFFFFFFF))): int(c)
        for u, c in zip(uniq, cnt)
    }
    assert got == dict(naive)


def test_keywords_at_most_k_per_doc(ray_session, sf_unit_dir):
    kw = QUERIES["keywords_tfidf"](sf_unit_dir).to_pandas()
    per_doc = kw.groupby("doc_id").size()
    assert (per_doc <= 3).all()
    assert (kw["score"] > 0).all()
    # a keyword must actually occur in its document
    import os

    import duckdb

    con = duckdb.connect()
    doc_id = int(kw["doc_id"].iloc[0])
    toks = set(
        con.execute(
            "SELECT coalesce(text,'') FROM read_parquet('"
            + os.path.join(sf_unit_dir, "documents.parquet")
            + f"') WHERE doc_id = {doc_id}"
        ).fetchone()[0].split()
    )
    assert set(kw.loc[kw["doc_id"] == doc_id, "token"]) <= toks
