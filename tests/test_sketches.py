"""Sketch-family operators and URL dedup: HyperLogLog registers,
Count-Min heavy hitters, URL canonicalization — oracle parity at
sf0.001 plus the sketch guarantees (HLL accuracy/mergeability, CM
never-underestimate/mergeability) and canonicalizer edge cases."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from oracle_utils import canon_frame, duck_oracle
from hypothesis import given, settings
from hypothesis import strategies as st

from ehdc_llpg_address_matching_ray.functions import sketches as SK
from ehdc_llpg_address_matching_ray.functions.urls import canonical_url_batch
from ehdc_llpg_address_matching_ray.pipelines.queries import ORACLE_SQL, QUERIES

SKETCH_QUERIES = ["hll_distinct", "countmin_heavy", "url_dedup"]


@pytest.mark.parametrize("name", SKETCH_QUERIES)
def test_query_matches_oracle(name, ray_session, sf_unit_dir):
    ray_df = canon_frame(QUERIES[name](sf_unit_dir).to_pandas())
    sql_df = canon_frame(duck_oracle(sf_unit_dir, ORACLE_SQL[name]))
    assert len(ray_df) == len(sql_df) > 0, name
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False)


class TestHLL:
    @pytest.mark.parametrize("n", [100, 1000, 20000])
    def test_estimate_accuracy(self, n):
        b, r = SK.hll_bucket_rho(SK.hash60([f"item-{i}" for i in range(n)]))
        est = SK.hll_estimate(b, r)
        # m=1024 -> ~3.25% std error; allow 4 sigma (linear counting is
        # tighter still in the small range)
        assert abs(est - n) / n < 0.13

    def test_merge_is_max(self):
        a = [f"a{i}" for i in range(500)]
        b = [f"b{i}" for i in range(500)] + a[:100]
        ba, ra = SK.hll_bucket_rho(SK.hash60(a))
        bb, rb = SK.hll_bucket_rho(SK.hash60(b))
        # merged registers (max) must equal the registers of the union
        bu, ru = SK.hll_bucket_rho(SK.hash60(sorted(set(a) | set(b))))
        reg = np.zeros(SK.HLL_M, np.int64)
        np.maximum.at(reg, np.concatenate([ba, bb]), np.concatenate([ra, rb]))
        reg_u = np.zeros(SK.HLL_M, np.int64)
        np.maximum.at(reg_u, bu, ru)
        assert (reg == reg_u).all()

    def test_rho_against_python_bit_length(self):
        h = SK.hash60([f"x{i}" for i in range(2000)])
        _, rho = SK.hll_bucket_rho(h)
        expect = [51 - int(w).bit_length() if w else 51 for w in (h >> SK.HLL_P)]
        assert rho.tolist() == expect


class TestCountMin:
    def _fit(self, counts: dict[str, int]) -> np.ndarray:
        sk = np.zeros((SK.CM_D, SK.CM_W), np.int64)
        toks = list(counts)
        b = SK.cm_buckets(toks)
        c = np.array([counts[t] for t in toks], np.int64)
        for r in range(SK.CM_D):
            np.add.at(sk[r], b[r], c)
        return sk

    def test_never_underestimates(self):
        counts = {f"t{i}": (i % 7) + 1 for i in range(5000)}
        counts["heavy"] = 10_000
        sk = self._fit(counts)
        toks = list(counts)
        est = SK.cm_estimate(sk, toks)
        true = np.array([counts[t] for t in toks])
        assert (est >= true).all()
        # the heavy hitter is far above the eps*N noise floor -> exact-ish
        assert est[toks.index("heavy")] < 10_000 + 2 * (sum(counts.values()) // SK.CM_W + 1) * 4

    def test_merge_is_sum(self):
        c1 = {f"t{i}": i + 1 for i in range(100)}
        c2 = {f"t{i}": 2 * i + 1 for i in range(50, 150)}
        merged = {
            t: c1.get(t, 0) + c2.get(t, 0) for t in set(c1) | set(c2)
        }
        assert (self._fit(c1) + self._fit(c2) == self._fit(merged)).all()


class TestCanonicalUrl:
    CASES = [
        # tracking params dropped, rest sorted, case/port/www/slashes fixed
        (
            "HTTP://WWW.Site-5.COM:80/docs//17/?utm_source=feed&b=2&a=1#top",
            "http://site-5.com/docs/17?a=1&b=2",
        ),
        ("http://site-5.com/docs/17?a=1&b=2", "http://site-5.com/docs/17?a=1&b=2"),
        # https default port; bare root slash is kept
        ("https://Example.com:443/", "https://example.com/"),
        ("https://example.com", "https://example.com"),
        # non-default port survives; path/query case preserved
        ("http://a.com:8080/X/y?Q=Hello", "http://a.com:8080/X/y?Q=Hello"),
        # every param is tracking -> no '?'
        ("http://a.com/x?utm_source=1&gclid=2&fbclid=3", "http://a.com/x"),
        # empty fragment only
        ("http://a.com/x#", "http://a.com/x"),
        # duplicate interior slashes
        ("http://a.com//x///y//", "http://a.com/x/y"),
    ]

    def test_cases(self):
        raw = pa.array([c[0] for c in self.CASES], pa.string())
        got = canonical_url_batch(raw).to_pylist()
        assert got == [c[1] for c in self.CASES]

    def test_null_and_empty(self):
        assert canonical_url_batch(pa.array([None, ""], pa.string())).to_pylist() == ["", ""]

    def test_schemeless_passthrough(self):
        raw = pa.array(["example.com/x?b=1", "not a url"], pa.string())
        assert canonical_url_batch(raw).to_pylist() == raw.to_pylist()

    @staticmethod
    def _scalar_canon(u: str) -> str:
        """Independent scalar reference (plain re) for the property test."""
        import re

        if "://" not in u:
            return u
        u = u.split("#", 1)[0]
        m = re.match(r"^([^:/?#]+://[^/?#]*)(.*)$", u)
        head, rest = m.group(1).lower(), m.group(2)
        head = re.sub(r"^http://([^/?#]*):80$", r"http://\1", head)
        head = re.sub(r"^https://([^/?#]*):443$", r"https://\1", head)
        head = re.sub(r"^(https?://)www\.", r"\1", head)
        path, _, q = rest.partition("?")
        path = re.sub("/{2,}", "/", path)
        path = re.sub("(.)/$", r"\1", path)
        params = sorted(
            p
            for p in q.split("&")
            if p and not re.match(r"^(utm_[^=]*|fbclid|gclid|msclkid)(=.*)?$", p)
        )
        return head + path + ("?" + "&".join(params) if params else "")

    @given(
        st.from_regex(
            r"((HTTPS?|https?)://)?(WWW\.|www\.)?[a-zA-Z0-9.\-]{1,16}"
            r"(:[0-9]{1,4})?(/[a-zA-Z0-9/._\-]{0,24})?"
            r"(\?[a-zA-Z0-9=&_]{0,24})?(#[a-zA-Z0-9]{0,8})?",
            fullmatch=True,
        )
    )
    @settings(max_examples=300, deadline=None)
    def test_matches_scalar_reference_and_idempotent(self, url):
        got = canonical_url_batch(pa.array([url], pa.string())).to_pylist()[0]
        assert got == self._scalar_canon(url)
        again = canonical_url_batch(pa.array([got], pa.string())).to_pylist()[0]
        assert again == got


def test_url_dedup_pairs_collapse(ray_session, sf_unit_dir):
    df = QUERIES["url_dedup"](sf_unit_dir).to_pandas()
    # synthesis makes doc pairs {2k, 2k+1} collide after canonicalization
    assert df["dup_count"].max() == 2
    assert (df.loc[df["dup_count"] == 2, "doc_id"] % 2 == 0).all()


def test_hll_estimate_close_to_exact(ray_session, sf_unit_dir):
    import duckdb as _dd

    regs = QUERIES["hll_distinct"](sf_unit_dir).to_pandas()
    con = _dd.connect()
    exact = con.execute(
        "SELECT coalesce(lang,'') AS lang, count(DISTINCT tok) AS n FROM ("
        "SELECT lang, unnest(regexp_extract_all(text, '\\S+')) AS tok "
        f"FROM read_parquet('{os.path.join(sf_unit_dir, 'documents.parquet')}')"
        ") GROUP BY 1"
    ).df()
    for lang, n in zip(exact["lang"], exact["n"]):
        g = regs[regs["lang"] == lang]
        est = SK.hll_estimate(g["bucket"].to_numpy(), g["rho"].to_numpy())
        assert abs(est - n) / n < 0.13, (lang, est, n)


class TestBloom:
    def test_partial_merge_probe(self):
        w1 = SK.bloom_partial(["10", "20"])
        w2 = SK.bloom_partial(["30"])
        merged = np.bitwise_or(w1, w2)
        assert SK.bloom_probe(merged, ["10", "20", "30"]).all()
        # merge order never matters
        assert (np.bitwise_or(w2, w1) == merged).all()
        assert len(merged) == SK.BLOOM_WORDS
        assert (merged >> 32 == 0).all()  # 32-bit words stay SQL-safe

    def test_no_false_negatives_ever(self):
        keys = [str(i) for i in range(500)]
        w = SK.bloom_partial(keys)
        assert SK.bloom_probe(w, keys).all()

    def test_empty(self):
        assert (SK.bloom_partial([]) == 0).all()
        assert SK.bloom_probe(np.zeros(SK.BLOOM_WORDS, np.int64), []).size == 0


BLOOM_QUERIES = ["bloom_filter", "bloom_join"]


@pytest.mark.parametrize("name", BLOOM_QUERIES)
def test_bloom_query_matches_oracle(name, ray_session, sf_unit_dir):
    import duckdb as _dd

    con = _dd.connect()
    for t in ("customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
            f"'{os.path.join(sf_unit_dir, t + '.parquet')}')"
        )
    ray_df = canon_frame(QUERIES[name](sf_unit_dir).to_pandas())
    sql_df = canon_frame(con.execute(ORACLE_SQL[name]).df())
    assert len(ray_df) == len(sql_df) > 0, name
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False)


def test_bloom_join_semantics(ray_session, sf_unit_dir):
    bj = QUERIES["bloom_join"](sf_unit_dir).to_pandas()
    # no false negatives: every true match passed the filter
    assert not (bj["true_match"] & ~bj["bloom_pass"]).any()
    # the filter prunes most of the big side before the semi-join
    assert bj["bloom_pass"].sum() < len(bj)
