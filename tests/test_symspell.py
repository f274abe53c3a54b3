"""SymSpell tests — shapes ported from internal/symspell/symspell_test.go."""

from __future__ import annotations

from ehdc_llpg_address_matching_ray.functions.symspell import (
    Corrector,
    SymSpell,
    build_from_corpus_tokens,
    damerau_levenshtein,
)


def make_index() -> SymSpell:
    s = SymSpell()
    s.add_terms(
        [
            ("HORNDEAN", 1000),
            ("PETERSFIELD", 5000),
            ("ALTON", 3000),
            ("WATERLOOVILLE", 800),
            ("LONDON", 9000),
            ("ROAD", 50000),
        ]
    )
    return s


class TestLookup:
    def test_exact_match(self):
        s = make_index()
        out = s.lookup("HORNDEAN")
        assert out[0].term == "HORNDEAN" and out[0].distance == 0

    def test_typo_correction(self):
        # symspell_test.go: HORNDENE -> HORNDEAN
        s = make_index()
        best = s.lookup_best("HORNDENE")
        assert best is not None and best.term == "HORNDEAN"
        assert best.distance == 2

    def test_transposition(self):
        # PETERSFEILD -> PETERSFIELD (Damerau transposition = distance 1)
        s = make_index()
        best = s.lookup_best("PETERSFEILD")
        assert best is not None and best.term == "PETERSFIELD"
        assert best.distance == 1

    def test_no_match(self):
        s = make_index()
        assert s.lookup_best("ZZZZZZZZZ") is None

    def test_frequency_ordering(self):
        s = SymSpell()
        s.add_terms([("ABCD", 10), ("ABCE", 9000)])
        out = s.lookup("ABCF")  # distance 1 to both
        assert [x.term for x in out[:2]] == ["ABCE", "ABCD"]


class TestDamerauLevenshtein:
    def test_transposition_is_one(self):
        assert damerau_levenshtein("AB", "BA", 2) == 1

    def test_early_exit(self):
        assert damerau_levenshtein("AAAAAAA", "BBBBBBB", 2) == -1

    def test_length_gate(self):
        assert damerau_levenshtein("A", "ABCDE", 2) == -1

    def test_plain_cases(self):
        assert damerau_levenshtein("KITTEN", "SITTING", 3) == 3
        assert damerau_levenshtein("", "AB", 2) == 2


class TestWithinOneEdit:
    """within_one_edit is the O(n) specialization the pair scorer uses in
    its fuzzy-token pass; it must agree with damerau_levenshtein(a,b,1)==1
    exhaustively on short alphabet strings."""

    def test_exhaustive_equivalence(self):
        from itertools import product

        from ehdc_llpg_address_matching_ray.functions.symspell import within_one_edit

        alphabet = "abc"
        strings = [""]
        for ln in (1, 2, 3, 4):
            strings += ["".join(p) for p in product(alphabet, repeat=ln)]
        for a in strings:
            for b in strings:
                assert within_one_edit(a, b) == (damerau_levenshtein(a, b, 1) == 1), (a, b)

    def test_typo_examples(self):
        from ehdc_llpg_address_matching_ray.functions.symspell import within_one_edit

        assert within_one_edit("street", "stret")       # deletion
        assert within_one_edit("street", "streeet")     # insertion
        assert within_one_edit("street", "streat")      # substitution
        assert within_one_edit("street", "strete")      # transposition
        assert not within_one_edit("street", "street")  # identical = 0
        assert not within_one_edit("street", "stert")   # distance 2


class TestCorrectorSkipRules:
    """corrector.go:100-143,188-203 skip rules."""

    def setup_method(self):
        self.c = Corrector(make_index())

    def test_skips_house_numbers(self):
        assert self.c.correct_token("12") == ("12", 0)
        assert self.c.correct_token("12A") == ("12A", 0)

    def test_skips_street_suffixes(self):
        assert self.c.correct_token("ROAD") == ("ROAD", 0)
        assert self.c.correct_token("CRESCENT") == ("CRESCENT", 0)

    def test_skips_short_tokens(self):
        assert self.c.correct_token("AB") == ("AB", 0)

    def test_corrects_address(self):
        corrected, corrections = self.c.correct_address("12 HORNDENE ROAD")
        assert corrected == "12 HORNDEAN ROAD"
        assert corrections == [("HORNDENE", "HORNDEAN", 2)]

    def test_no_change_passthrough(self):
        addr = "12 HORNDEAN ROAD"
        corrected, corrections = self.c.correct_address(addr)
        assert corrected == addr and corrections == []


def test_build_from_corpus():
    idx = build_from_corpus_tokens({"PETERSFIELD": 10, "XY": 5, "ALTON": 1}, min_frequency=2)
    assert idx.contains("PETERSFIELD")
    assert not idx.contains("XY")  # below min length
    assert not idx.contains("ALTON")  # below min frequency


class TestDistributedTokenDf:
    """The distributed token-df fit (per-block partials -> token-keyed
    merge with per-partition vocab cap) must agree with the exact driver
    path when every text is unique (no cross-block dedup divergence),
    and must bound what reaches the driver."""

    def test_matches_driver_path_and_caps(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from ehdc_llpg_address_matching_ray.stages.correct import fit_token_df

        rows = []
        for i in range(300):
            # skewed vocabulary: COMMON in every row, rare tokens tail
            rows.append((f"u{i}", f"COMMON MID{i % 7} RARE{i}", f"h{i}"))
        ds = rd.from_arrow(
            pa.table(
                {
                    "url": [r[0] for r in rows],
                    "canonical": [r[1] for r in rows],
                    "text_hash": [r[2] for r in rows],
                }
            )
        ).repartition(6)

        exact_df, exact_n = fit_token_df(ds, distributed_threshold=10**9)
        dist_df, dist_n = fit_token_df(ds, distributed_threshold=0)
        assert dist_n == exact_n == 300
        assert dict(dist_df) == dict(exact_df)

        capped_df, capped_n = fit_token_df(ds, distributed_threshold=0, max_vocab=5)
        assert capped_n == 300
        assert len(capped_df) <= 5
        # the cap keeps the most frequent tokens
        assert capped_df["COMMON"] == 300
