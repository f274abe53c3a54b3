"""Pairwise feature computation, linear-blend scoring, decisions.

Reference provenance (/root/reference):
- ComputeFeatures      internal/match/features.go:34-146   (P1)
- ScoreCandidate       internal/match/scorer.go:52-139     (P2)
- MakeDecision         internal/match/scorer.go:142-198    (D2)
- hard filters         internal/engine/fuzzy.go:334-357    (P5)
- hasCloseNumbers      internal/engine/fuzzy.go:505-525

The graft mapping (web pages instead of addresses): ``raw`` = the page's
extracted text, ``canonical``/``tokens`` = normalize-stage output.  The
spatial features are absent (no coordinates in the pages schema) and the
llpg_live placeholder stays hard-true (features.go:131), usrn_match stays
hard-false (features.go:137) — ported faithfully so scores line up with
the reference blend.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..config import FeatureWeights, MatchTiers
from . import embed as E
from . import normalize as N
from . import phonetics as P
from . import strings as S

# Descriptors checked for the mismatch penalty (features.go:291)
_PENALTY_DESCRIPTORS = ("LAND AT", "REAR OF", "ADJACENT TO", "PLOT", "SITE")


def has_descriptor_mismatch(src_raw: str, cand_raw: str) -> bool:
    """Port of hasDescriptorMismatch (features.go:290-316)."""
    src_upper = src_raw.upper()
    if not any(d in src_upper for d in _PENALTY_DESCRIPTORS):
        return False
    cand_upper = cand_raw.upper()
    if any(d in cand_upper for d in _PENALTY_DESCRIPTORS):
        return False
    return True


def _alpha_suffix(house_num: str) -> str:
    """features.go:263-268."""
    if len(house_num) > 1 and "A" <= house_num[-1] <= "Z":
        return house_num[-1]
    return ""


def has_common_element(a: list[str], b: list[str]) -> bool:
    """features.go:246-258 (uppercased set intersection)."""
    s = {x.upper() for x in a}
    return any(x.upper() in s for x in b)


def has_common_alpha(a: list[str], b: list[str]) -> bool:
    """features.go:261-282 (matching alpha suffixes of house numbers)."""
    for n1 in a:
        s1 = _alpha_suffix(n1.upper())
        if s1:
            for n2 in b:
                if _alpha_suffix(n2.upper()) == s1:
                    return True
    return False


def compute_pair_features(
    src_raw: str,
    src_canonical: str,
    src_tokens: list[str],
    cand_raw: str,
    cand_canonical: str,
    cand_tokens: list[str],
    use_embedder: bool = True,
    use_phonetics: bool = True,
) -> dict:
    """Port of ComputeFeatures (features.go:34-146) for one pair.

    In the reference the candidate side is re-canonicalized inside the
    feature computer (features.go:46); here canonical forms arrive
    precomputed by the normalize stage (same function, so identical).
    """
    f: dict = {}
    f["trigram_similarity"] = S.trigram_similarity_approx(src_canonical, cand_canonical)
    f["jaro_similarity"] = S.jaro_similarity(src_canonical, cand_canonical)
    f["levenshtein_similarity"] = 1.0 - S.normalized_levenshtein(src_canonical, cand_canonical)
    f["cosine_bow"] = S.cosine_bag_of_words(src_tokens, cand_tokens)

    if use_embedder:
        v = E.embed_batch([src_canonical, cand_canonical])
        f["embedding_cosine"] = E.cosine_similarity(v[0], v[1])
    else:
        f["embedding_cosine"] = 0.0

    src_house = N.extract_house_numbers(src_raw)
    cand_house = N.extract_house_numbers(cand_raw)
    f["has_same_house_num"] = has_common_element(src_house, cand_house)
    f["has_same_house_alpha"] = has_common_alpha(src_house, cand_house)

    f["locality_overlap_ratio"] = N.token_overlap(
        N.extract_locality_tokens(src_raw), N.extract_locality_tokens(cand_raw)
    )
    f["street_overlap_ratio"] = N.token_overlap(
        N.tokenize_street(src_raw), N.tokenize_street(cand_raw)
    )
    f["descriptor_penalty"] = has_descriptor_mismatch(src_raw, cand_raw)

    if use_phonetics:
        f["phonetic_hits"] = P.count_phonetic_matches(src_tokens, cand_tokens)
    else:
        f["phonetic_hits"] = 0

    # No coordinates in the pages schema (features.go:115-126 else-branch)
    f["spatial_boost"] = 0.0
    # Placeholders ported faithfully (features.go:131,137)
    f["llpg_live"] = True
    f["usrn_match"] = False
    return f


def score_features(features: dict, weights: FeatureWeights, legacy_uprn_valid: bool = False) -> float:
    """Port of ScoreCandidate (scorer.go:52-139): linear blend, clamped [0,1]."""
    score = 0.0
    score += weights.trigram_similarity * float(features.get("trigram_similarity", 0.0))
    score += weights.embedding_cosine * float(features.get("embedding_cosine", 0.0))
    score += weights.locality_overlap * float(features.get("locality_overlap_ratio", 0.0))
    score += weights.street_overlap * float(features.get("street_overlap_ratio", 0.0))
    if features.get("has_same_house_num"):
        score += weights.same_house_number
    if features.get("has_same_house_alpha"):
        score += weights.same_house_alpha
    if features.get("usrn_match"):
        score += weights.usrn_match
    if features.get("llpg_live"):
        score += weights.llpg_live
    if legacy_uprn_valid:
        score += weights.legacy_uprn_valid
    score += float(features.get("spatial_boost", 0.0))
    if features.get("descriptor_penalty"):
        score += weights.descriptor_penalty
    if int(features.get("phonetic_hits", 0)) == 0:
        score += weights.phonetic_miss_penalty
    return max(0.0, min(1.0, score))


@dataclass(frozen=True)
class ScoredCandidate:
    cand_id: str
    score: float
    has_same_house_num: bool = False
    locality_overlap_ratio: float = 0.0


def make_decision(
    candidates: list[ScoredCandidate], tiers: MatchTiers
) -> tuple[str, str]:
    """Port of MakeDecision (scorer.go:142-198).

    ``candidates`` must be sorted score-descending.  Returns
    (decision, accepted_id) with decision in {auto_accept, review, reject}.
    """
    if not candidates:
        return "reject", ""
    top = candidates[0]
    if top.score < tiers.min_threshold:
        return "reject", ""
    margin = 1.0 if len(candidates) == 1 else top.score - candidates[1].score
    if top.score >= tiers.auto_accept_high and margin >= tiers.winner_margin:
        return "auto_accept", top.cand_id
    if top.score >= tiers.auto_accept_medium and margin >= tiers.winner_margin + 0.02:
        if top.has_same_house_num and top.locality_overlap_ratio >= 0.5:
            return "auto_accept", top.cand_id
    if top.score >= tiers.review_threshold:
        return "review", ""
    return "reject", ""


def has_close_numbers(nums1: list[str], nums2: list[str], tolerance: int = 2) -> bool:
    """Port of hasCloseNumbers (internal/engine/fuzzy.go:505-525):
    any numeric pair within ±tolerance."""
    def numeric(parts: list[str]) -> list[int]:
        out = []
        for p in parts:
            digits = "".join(c for c in p if c.isdigit())
            if digits:
                out.append(int(digits))
        return out

    a, b = numeric(nums1), numeric(nums2)
    for x in a:
        for y in b:
            if abs(x - y) <= tolerance:
                return True
    return False


def passes_hard_filters(features: dict, src_raw: str, cand_raw: str) -> bool:
    """Port of the candidate hard filters (internal/engine/fuzzy.go:334-357):
    drop when trigram < 0.85 with zero phonetic hits; drop when both sides
    carry house numbers that differ and are not within ±2."""
    if float(features.get("trigram_similarity", 0.0)) < 0.85 and int(features.get("phonetic_hits", 0)) == 0:
        return False
    src_house = N.extract_house_numbers(src_raw)
    cand_house = N.extract_house_numbers(cand_raw)
    if src_house and cand_house:
        if not has_common_element(src_house, cand_house) and not has_close_numbers(src_house, cand_house):
            return False
    return True

def score_features_alt(features: dict, spatial_boost: float = 0.0, status_live: bool = False) -> float:
    """P3 — the engine package's alternative fuzzy blend
    (internal/engine/fuzzy.go:287-331): 0.50*trgm + 0.40*jaro +
    0.05*locality + 0.05*street + 0.08[house] + 0.02[alpha] +
    0.03[phonetic>0] + 0.05*spatial + 0.02[status=1]
    - 0.03[no-phonetic & trgm<0.85], clamped to [0,1].

    The primary engine uses P2 (score_features, the documented
    ADDRESS_MATCHING_ALGORITHM.md:208-223 formula); P3 is kept for parity
    checks and configurable experimentation (SURVEY.md §7.5)."""
    trgm = features.get("trigram_similarity", 0.0)
    score = 0.50 * trgm
    score += 0.40 * features.get("jaro_similarity", 0.0)
    # Accept both the compute_pair_features key names (the engine path)
    # and the short fuzzy.go-style aliases (unit-test / ad-hoc dicts)
    score += 0.05 * features.get(
        "locality_overlap_ratio", features.get("locality_overlap", 0.0)
    )
    score += 0.05 * features.get(
        "street_overlap_ratio", features.get("street_overlap", 0.0)
    )
    if features.get("has_same_house_num", features.get("same_house_number")):
        score += 0.08
    if features.get("has_same_house_alpha", features.get("same_house_alpha")):
        score += 0.02
    phonetic_hits = features.get("phonetic_hits", 0)
    if phonetic_hits > 0:
        score += 0.03
    score += spatial_boost * 0.05
    if status_live:
        score += 0.02
    if phonetic_hits == 0 and trgm < 0.85:
        score -= 0.03
    return max(0.0, min(1.0, score))
