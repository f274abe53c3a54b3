"""Scorer / decision tests — hand-computed blends using the reference
weights (internal/match/types.go:76-91) and decision tiers
(internal/match/scorer.go:142-198).  Also covers the embedder, phonetics
and hard filters."""

from __future__ import annotations

import numpy as np
import pytest

from ehdc_llpg_address_matching_ray.config import FeatureWeights, MatchTiers
from ehdc_llpg_address_matching_ray.functions import embed as E
from ehdc_llpg_address_matching_ray.functions import features as F
from ehdc_llpg_address_matching_ray.functions import phonetics as P

W = FeatureWeights()
T = MatchTiers()


class TestScoreFeatures:
    def test_hand_computed_blend(self):
        feats = {
            "trigram_similarity": 0.9,
            "embedding_cosine": 0.8,
            "locality_overlap_ratio": 1.0,
            "street_overlap_ratio": 0.5,
            "has_same_house_num": True,
            "has_same_house_alpha": False,
            "usrn_match": False,
            "llpg_live": True,
            "spatial_boost": 0.0,
            "descriptor_penalty": False,
            "phonetic_hits": 3,
        }
        want = 0.45 * 0.9 + 0.45 * 0.8 + 0.05 * 1.0 + 0.05 * 0.5 + 0.08 + 0.03
        assert F.score_features(feats, W) == pytest.approx(want)

    def test_penalties(self):
        feats = {
            "trigram_similarity": 0.5,
            "embedding_cosine": 0.5,
            "descriptor_penalty": True,
            "phonetic_hits": 0,
            "llpg_live": False,
        }
        want = 0.45 * 0.5 + 0.45 * 0.5 - 0.05 - 0.03
        assert F.score_features(feats, W) == pytest.approx(want)

    def test_legacy_uprn_boost(self):
        feats = {"trigram_similarity": 0.5, "embedding_cosine": 0.0, "phonetic_hits": 1}
        base = F.score_features(feats, W, legacy_uprn_valid=False)
        boosted = F.score_features(feats, W, legacy_uprn_valid=True)
        assert boosted == pytest.approx(base + 0.20)

    def test_clamped_to_unit_interval(self):
        hot = {k: True for k in ("has_same_house_num", "has_same_house_alpha", "usrn_match", "llpg_live")}
        hot.update(
            trigram_similarity=1.0, embedding_cosine=1.0, locality_overlap_ratio=1.0,
            street_overlap_ratio=1.0, spatial_boost=0.10, phonetic_hits=5,
        )
        assert F.score_features(hot, W, legacy_uprn_valid=True) == 1.0
        cold = {"trigram_similarity": 0.0, "embedding_cosine": 0.0, "phonetic_hits": 0,
                "descriptor_penalty": True, "llpg_live": False}
        assert F.score_features(cold, W) == 0.0


def sc(cid, score, house=False, loc=0.0):
    return F.ScoredCandidate(cid, score, house, loc)


class TestMakeDecision:
    def test_no_candidates(self):
        assert F.make_decision([], T) == ("reject", "")

    def test_below_min_threshold(self):
        assert F.make_decision([sc("u1", 0.65)], T) == ("reject", "")

    def test_auto_accept_high_with_margin(self):
        d, u = F.make_decision([sc("u1", 0.95), sc("u2", 0.80)], T)
        assert (d, u) == ("auto_accept", "u1")

    def test_high_score_insufficient_margin(self):
        d, u = F.make_decision([sc("u1", 0.95), sc("u2", 0.94)], T)
        assert d == "review" and u == ""

    def test_single_candidate_full_margin(self):
        # scorer.go:163 — margin defaults to 1.0 with one candidate
        assert F.make_decision([sc("u1", 0.92)], T) == ("auto_accept", "u1")

    def test_medium_tier_needs_conditions(self):
        # 0.88 tier: margin ≥ 0.05 AND house number AND locality ≥ 0.5
        good = [sc("u1", 0.90, house=True, loc=0.6), sc("u2", 0.80)]
        assert F.make_decision(good, T) == ("auto_accept", "u1")
        no_house = [sc("u1", 0.90, house=False, loc=0.6), sc("u2", 0.80)]
        assert F.make_decision(no_house, T) == ("review", "")
        low_loc = [sc("u1", 0.90, house=True, loc=0.3), sc("u2", 0.80)]
        assert F.make_decision(low_loc, T) == ("review", "")

    def test_review_band(self):
        assert F.make_decision([sc("u1", 0.85), sc("u2", 0.84)], T) == ("review", "")

    def test_reject_band(self):
        # ≥ min (0.70) but < review (0.80) -> reject per scorer.go:190-197
        assert F.make_decision([sc("u1", 0.75)], T) == ("reject", "")


class TestPairFeatures:
    def test_identical_pair_scores_high(self):
        raw = "12 HIGH STREET ALTON"
        f = F.compute_pair_features(raw, raw, raw.split(), raw, raw, raw.split())
        assert f["trigram_similarity"] == 1.0
        assert f["jaro_similarity"] == 1.0
        assert f["cosine_bow"] == pytest.approx(1.0)
        assert f["embedding_cosine"] == pytest.approx(1.0)
        assert f["has_same_house_num"] is True
        s = F.score_features(f, W)
        assert s >= T.auto_accept_high

    def test_house_number_mismatch_detected(self):
        # The production regression class: "4 MONKS ORCHARD ≠ 16 MONKS ORCHARD"
        # (validator_test.go:173 critical cases)
        a = "4 MONKS ORCHARD"
        b = "16 MONKS ORCHARD"
        f = F.compute_pair_features(a, a, a.split(), b, b, b.split())
        assert f["has_same_house_num"] is False
        assert not F.passes_hard_filters(f, a, b)

    def test_close_numbers_pass_filter(self):
        # fuzzy.go:505-525 — ±2 numeric proximity is allowed through
        a = "4 MONKS ORCHARD"
        b = "5 MONKS ORCHARD"
        f = F.compute_pair_features(a, a, a.split(), b, b, b.split())
        assert F.passes_hard_filters(f, a, b)

    def test_descriptor_mismatch(self):
        assert F.has_descriptor_mismatch("LAND AT MILL LANE", "MILL LANE") is True
        assert F.has_descriptor_mismatch("MILL LANE", "LAND AT MILL LANE") is False
        assert F.has_descriptor_mismatch("LAND AT X", "PLOT X") is False


class TestEmbedder:
    def test_deterministic_unit_vectors(self):
        v1 = E.embed("12 HIGH STREET")
        v2 = E.embed("12 HIGH STREET")
        assert np.array_equal(v1, v2)
        assert np.linalg.norm(v1) == pytest.approx(1.0, abs=1e-5)

    def test_empty_is_zero(self):
        assert not E.embed("").any()

    def test_batch_matches_scalar(self):
        texts = ["12 HIGH STREET", "THE OLD MILL", "", "X"]
        batch = E.embed_batch(texts)
        for i, t in enumerate(texts):
            assert np.array_equal(batch[i], E.embed(t))

    def test_cosine_matrix_matches_scalar(self):
        a = E.embed_batch(["AAA ROAD", "BBB LANE"])
        b = E.embed_batch(["AAA ROAD X", "CCC DRIVE"])
        m = E.cosine_matrix(a, b)
        for i in range(2):
            assert m[i] == pytest.approx(E.cosine_similarity(a[i], b[i]))

    def test_case_insensitive(self):
        assert np.array_equal(E.embed("high street"), E.embed("HIGH STREET"))


class TestPhonetics:
    def test_metaphone_basic(self):
        # metaphone.go transformations
        assert P.metaphone("PHONE") == P.metaphone("FONE")
        assert P.metaphone("") == ""

    def test_match(self):
        assert P.phonetic_match("SMITH", "SMYTH")
        assert not P.phonetic_match("", "X")

    def test_count_matches_counts_each_token_once(self):
        # features.go:319-334 — break after first match per token1
        n = P.count_phonetic_matches(["SMITH"], ["SMYTH", "SMITH"])
        assert n == 1
        assert P.count_phonetic_matches(["SMITH", "ROAD"], ["SMYTH", "ROAD"]) == 2
        assert P.count_phonetic_matches([], ["X"]) == 0


class TestAlternativeScore:
    def test_p3_blend(self):
        from ehdc_llpg_address_matching_ray.functions.features import score_features_alt

        f = {
            "trigram_similarity": 1.0,
            "jaro_similarity": 1.0,
            "locality_overlap": 1.0,
            "street_overlap": 1.0,
            "same_house_number": True,
            "same_house_alpha": True,
            "phonetic_hits": 2,
        }
        assert score_features_alt(f, spatial_boost=1.0, status_live=True) == 1.0
        # no-phonetic penalty below trgm 0.85
        low = {"trigram_similarity": 0.5, "jaro_similarity": 0.5, "phonetic_hits": 0}
        assert abs(score_features_alt(low) - (0.25 + 0.2 - 0.03)) < 1e-9
        assert score_features_alt({}) == 0.0


class TestMediumTierParity:
    """decide_partition (distributed D2) must agree with make_decision
    (the scorer.go:142-198 port) on the SAME candidate lists, including
    the 0.88 medium tier's house/locality conditions."""

    def test_parity_random_candidates(self):
        import random

        import pandas as pd

        from ehdc_llpg_address_matching_ray.config import MatchTiers
        from ehdc_llpg_address_matching_ray.functions.features import (
            ScoredCandidate,
            make_decision,
        )
        from ehdc_llpg_address_matching_ray.stages.decide import decide_partition

        random.seed(5)
        tiers = MatchTiers()
        rows = []
        expected = {}
        for s in range(200):
            src = f"s{s:03d}"
            cands = []
            for c in range(random.randint(1, 4)):
                score = round(random.uniform(0.6, 1.0), 3)
                house = random.random() < 0.5
                loc = random.choice([0.0, 0.3, 0.5, 1.0])
                cands.append((f"c{c}", score, house, loc))
            cands.sort(key=lambda x: (-x[1], x[0]))
            sc = [
                ScoredCandidate(
                    cand_id=cid, score=scr, has_same_house_num=h, locality_overlap_ratio=l
                )
                for cid, scr, h, l in cands
            ]
            expected[src] = make_decision(sc, tiers)
            rows.extend((src, cid, scr, h, l) for cid, scr, h, l in cands)

        df = pd.DataFrame(
            rows, columns=["src", "cand", "score", "has_same_house_num", "locality_overlap"]
        )
        out = decide_partition(df, tiers).to_pandas()
        assert len(out) == 200
        medium_hits = 0
        for r in out.itertuples(index=False):
            exp_dec, exp_acc = expected[r.url]
            assert (r.decision, r.accepted_url) == (exp_dec, exp_acc), r.url
            if (
                exp_dec == "auto_accept"
                and r.top_score < tiers.auto_accept_high + 1e-12
                and r.top_score >= tiers.auto_accept_medium
            ):
                medium_hits += 1
        # the random pool must actually exercise the medium tier
        assert medium_hits > 0


class TestAltFormulaEnginePath:
    def test_pair_scorer_alt_formula_parity(self):
        """P3 wired as an engine option: PairScorer(formula='alt') must score
        each pair exactly as score_features_alt(compute_pair_features(...)),
        with the house-number veto still applied to edge selection."""
        import pyarrow as pa

        from ehdc_llpg_address_matching_ray.functions import normalize as N
        from ehdc_llpg_address_matching_ray.stages.scoring import (
            PairScorer,
            ProductionWeights,
        )

        raws = [
            ("12 High Street, Alton", "12 HIGH ST ALTON"),
            ("14 High Street, Alton", "12 High Street, Alton"),  # veto pair
            ("The Old Barn, Selborne Road", "Old Barn Selbourne Rd"),
            ("Flat 2, 7 Mill Lane", "7 Mill Lane Flat 2"),
        ]
        text_a = [a for a, _ in raws]
        text_b = [b for _, b in raws]
        can_a = [N.canonical_address(t)[0] for t in text_a]
        can_b = [N.canonical_address(t)[0] for t in text_b]
        batch = pa.table(
            {
                "url_a": [f"a{i}" for i in range(len(raws))],
                "url_b": [f"b{i}" for i in range(len(raws))],
                "text_a": text_a,
                "text_b": text_b,
                "canonical_a": can_a,
                "canonical_b": can_b,
            }
        )
        alt = PairScorer(prod=ProductionWeights(formula="alt"))
        out = alt(batch)
        scores = out["score"].to_pylist()
        for i in range(len(raws)):
            feats = F.compute_pair_features(
                text_a[i],
                can_a[i],
                can_a[i].split(" ") if can_a[i] else [],
                text_b[i],
                can_b[i],
                can_b[i].split(" ") if can_b[i] else [],
            )
            assert abs(scores[i] - F.score_features_alt(feats)) < 1e-12
        # full-feature terms must contribute (locality/street/house keys
        # spelled as compute_pair_features emits them)
        f0 = F.compute_pair_features(
            text_a[0], can_a[0], can_a[0].split(" "), text_b[0], can_b[0], can_b[0].split(" ")
        )
        assert f0["has_same_house_num"]
        assert F.score_features_alt(f0) > 0.5 * f0["trigram_similarity"] + 0.4 * f0["jaro_similarity"]
        # veto pair: different house numbers -> not an edge even under alt
        veto = out["house_veto"].to_pylist()
        is_edge = out["is_edge"].to_pylist()
        assert veto[1] and not is_edge[1]

    def test_config_formula_flows_to_weights(self):
        from ehdc_llpg_address_matching_ray.config import PipelineConfig
        from ehdc_llpg_address_matching_ray.stages.scoring import ProductionWeights

        cfg = PipelineConfig(score_formula="alt")
        assert ProductionWeights(formula=cfg.score_formula).formula == "alt"
