"""String-kernel tests pinning the reference's exact (quirky) semantics."""

from __future__ import annotations

import math

import pytest

from ehdc_llpg_address_matching_ray.functions import strings as S


class TestJaro:
    def test_identical(self):
        assert S.jaro_similarity("MARTHA", "MARTHA") == 1.0

    def test_empty(self):
        assert S.jaro_similarity("", "ABC") == 0.0
        assert S.jaro_similarity("ABC", "") == 0.0

    def test_classic_martha(self):
        # MARTHA/MARHTA: m=6, t(go-counted mismatch positions)=2 -> t//2=1
        # jaro = (1 + 1 + 5/6)/3
        got = S.jaro_similarity("MARTHA", "MARHTA")
        assert got == pytest.approx((1.0 + 1.0 + 5.0 / 6.0) / 3.0)

    def test_no_match(self):
        assert S.jaro_similarity("ABC", "XYZ") == 0.0

    def test_integer_division_quirk(self):
        # DWAYNE/DUANE: matches=4 (D,A,N,E), mismatched positions=0
        got = S.jaro_similarity("DWAYNE", "DUANE")
        assert got == pytest.approx((4 / 6 + 4 / 5 + 4 / 4) / 3.0)

    def test_bytewise_on_utf8(self):
        # Go indexes BYTES; é is 2 bytes -> lengths differ from rune counts
        got = S.jaro_similarity("é", "e")
        # b1=[0xC3,0xA9] (len2), b2=[0x65] (len1): no byte matches
        assert got == 0.0


class TestLevenshtein:
    def test_basic(self):
        assert S.levenshtein_distance("KITTEN", "SITTING") == 3
        assert S.levenshtein_distance("", "ABC") == 3
        assert S.levenshtein_distance("SAME", "SAME") == 0

    def test_normalized(self):
        assert S.normalized_levenshtein("ABCD", "ABCE") == pytest.approx(0.25)

    def test_normalized_empty_quirk(self):
        # features.go:163-181: one empty side returns the RAW length
        assert S.normalized_levenshtein("", "ABCDE") == 5.0
        assert S.normalized_levenshtein("ABC", "") == 3.0
        assert S.normalized_levenshtein("", "") == 0.0


class TestCosineBow:
    def test_both_empty(self):
        assert S.cosine_bag_of_words([], []) == 1.0

    def test_one_empty(self):
        assert S.cosine_bag_of_words(["A"], []) == 0.0

    def test_identical(self):
        assert S.cosine_bag_of_words(["A", "B"], ["A", "B"]) == pytest.approx(1.0)

    def test_partial(self):
        # {A:1,B:1} vs {A:1,C:1}: dot=1, norms=sqrt2*sqrt2 -> 0.5
        assert S.cosine_bag_of_words(["A", "B"], ["A", "C"]) == pytest.approx(0.5)

    def test_frequency_weighting(self):
        got = S.cosine_bag_of_words(["A", "A"], ["A"])
        assert got == pytest.approx(1.0)


class TestTrigramApprox:
    def test_equal(self):
        assert S.trigram_similarity_approx("X", "X") == 1.0

    def test_empty(self):
        assert S.trigram_similarity_approx("", "X") == 0.0

    def test_scaled_jaro(self):
        # features.go:149-160 — jaro × 0.9
        assert S.trigram_similarity_approx("MARTHA", "MARHTA") == pytest.approx(
            S.jaro_similarity("MARTHA", "MARHTA") * 0.9
        )


class TestJaroWinkler:
    def test_prefix_boost(self):
        j = S.jaro_similarity("MARTHA", "MARHTA")
        jw = S.jaro_winkler("MARTHA", "MARHTA")
        assert jw == pytest.approx(j + 3 * 0.1 * (1 - j))

    def test_bounds(self):
        assert S.jaro_winkler("SAME", "SAME") == 1.0
        assert 0.0 <= S.jaro_winkler("ABCDEF", "GHIJKL") <= 1.0


class TestTokenSetRatio:
    def test_jaccard(self):
        assert S.token_set_ratio(["A", "B"], ["B", "C"]) == pytest.approx(1 / 3)
        assert S.token_set_ratio([], []) == 1.0
        assert S.token_set_ratio(["A"], []) == 0.0
        assert S.token_set_ratio(["A", "A", "B"], ["A", "B"]) == 1.0


class TestJaroWinklerBatch:
    """The numpy batch kernel must be bit-identical to the scalar port
    (the scalar is the parity oracle; the batch runs in production)."""

    def test_parity_random(self):
        import random

        random.seed(123)
        alphabet = "abcdefghijklmnop 0123456789é"

        def rnd():
            return "".join(
                random.choice(alphabet) for _ in range(random.randint(0, 64))
            )

        A = [rnd() for _ in range(500)] + ["", "", "abc", "monks orchard 4"]
        B = [rnd() for _ in range(500)] + ["", "x", "abc", "monks orchard 16"]
        got = S.jaro_winkler_batch(A, B)
        for a, b, g in zip(A, B, got):
            assert g == pytest.approx(S.jaro_winkler(a, b), abs=1e-12), (a, b)

    def test_hypothesis_parity(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=200, deadline=None)
        @given(
            st.lists(
                st.tuples(st.text(max_size=40), st.text(max_size=40)),
                min_size=1,
                max_size=8,
            )
        )
        def check(pairs):
            A = [p[0] for p in pairs]
            B = [p[1] for p in pairs]
            got = S.jaro_winkler_batch(A, B)
            for a, b, g in zip(A, B, got):
                assert abs(g - S.jaro_winkler(a, b)) < 1e-12

        check()

    def test_empty_batch(self):
        assert len(S.jaro_winkler_batch([], [])) == 0
