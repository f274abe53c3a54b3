"""M2 — EnhancedCanonicalAddress, the reference's second (divergent)
normalizer, used by the hierarchical matcher.

Port of /root/reference internal/normalize/enhanced.go:
- pipeline order            :24-52 (postcode strip -> upper -> abbrev ->
                             noise words -> business names -> punctuation
                             -> whitespace collapse -> tokens)
- ~90 positional expansions :57-174 (map iterated in random order in Go;
  the rules are space/anchor-delimited and mutually non-interacting, so
  we fix the SOURCE-LITERAL order for determinism — documented)
- noise-word removal        :196-223
- business-name canon       :226-250
- punctuation policy        :253-273 (& -> " AND ")
- component blend           :346-398 (MatchByComponents)
- char-containment "jaro"   :401-419 (named Jaro-Winkler but actually
  per-byte containment — ported as-is, divergence noted)
- token Jaccard             :429-462 (PartialStringMatch)
"""

from __future__ import annotations

import re

from .normalize import canonical_address

# (kind, pattern, replacement): kind in {"sub", "prefix", "suffix"} —
# plain substring replace, start-anchored regex, end-anchored regex.
_ABBREV: tuple[tuple[str, str, str], ...] = (
    ("sub", " RD ", " ROAD "), ("suffix", " RD", " ROAD"), ("prefix", "RD ", "ROAD "),
    ("sub", " ST ", " STREET "), ("suffix", " ST", " STREET"), ("prefix", "ST ", "STREET "),
    ("sub", " AVE ", " AVENUE "), ("suffix", " AVE", " AVENUE"),
    ("sub", " CT ", " COURT "), ("suffix", " CT", " COURT"),
    ("sub", " PL ", " PLACE "), ("suffix", " PL", " PLACE"),
    ("sub", " DR ", " DRIVE "), ("suffix", " DR", " DRIVE"),
    ("sub", " LN ", " LANE "), ("suffix", " LN", " LANE"),
    ("sub", " GDNS ", " GARDENS "), ("suffix", " GDNS", " GARDENS"),
    ("sub", " GRNS ", " GARDENS "),
    ("sub", " GRN ", " GREEN "), ("suffix", " GRN", " GREEN"),
    ("sub", " CLS ", " CLOSE "),
    ("sub", " CL ", " CLOSE "), ("suffix", " CL", " CLOSE"),
    ("sub", " CRES ", " CRESCENT "), ("suffix", " CRES", " CRESCENT"),
    ("sub", " SQ ", " SQUARE "), ("suffix", " SQ", " SQUARE"),
    ("sub", " TER ", " TERRACE "), ("suffix", " TER", " TERRACE"),
    ("sub", " WLK ", " WALK "), ("sub", " WK ", " WALK "),
    ("sub", " WY ", " WAY "), ("suffix", " WY", " WAY"),
    ("sub", " GRV ", " GROVE "), ("suffix", " GRV", " GROVE"),
    ("sub", " PK ", " PARK "), ("suffix", " PK", " PARK"),
    ("sub", " VW ", " VIEW "), ("suffix", " VW", " VIEW"),
    ("sub", " HTS ", " HEIGHTS "), ("suffix", " HTS", " HEIGHTS"),
    ("sub", " HL ", " HILL "), ("suffix", " HL", " HILL"),
    ("sub", " PSGE ", " PASSAGE "),
    ("sub", " YD ", " YARD "), ("suffix", " YD", " YARD"),
    ("sub", " MS ", " MEWS "), ("suffix", " MS", " MEWS"),
    ("sub", " EST ", " ESTATE "), ("suffix", " EST", " ESTATE"),
    ("sub", " RIS ", " RISE "), ("suffix", " RIS", " RISE"),
    ("sub", " PTH ", " PATH "), ("suffix", " PTH", " PATH"),
    ("sub", " N ", " NORTH "), ("prefix", "N ", "NORTH "),
    ("sub", " S ", " SOUTH "), ("prefix", "S ", "SOUTH "),
    ("sub", " E ", " EAST "), ("prefix", "E ", "EAST "),
    ("sub", " W ", " WEST "), ("prefix", "W ", "WEST "),
    ("sub", " NE ", " NORTH EAST "), ("sub", " NW ", " NORTH WEST "),
    ("sub", " SE ", " SOUTH EAST "), ("sub", " SW ", " SOUTH WEST "),
    ("sub", " ST. ", " SAINT "), ("prefix", "ST\\. ", "SAINT "),
    ("sub", " MT ", " MOUNT "), ("prefix", "MT ", "MOUNT "),
    ("sub", " MT. ", " MOUNT "), ("prefix", "MT\\. ", "MOUNT "),
    ("sub", " FT ", " FORT "), ("prefix", "FT ", "FORT "),
    ("sub", " FT. ", " FORT "), ("prefix", "FT\\. ", "FORT "),
    ("sub", " BLDG ", " BUILDING "), ("sub", " BLDGS ", " BUILDINGS "),
    ("sub", " BLK ", " BLOCK "), ("sub", " FLR ", " FLOOR "),
    ("sub", " FL ", " FLAT "), ("sub", " APT ", " APARTMENT "),
    ("sub", " STE ", " SUITE "), ("sub", " RM ", " ROOM "),
    ("sub", " HSE ", " HOUSE "), ("sub", " HO ", " HOUSE "),
    ("sub", " COTT ", " COTTAGE "), ("sub", " CTG ", " COTTAGE "),
    ("sub", " CTR ", " CENTRE "), ("sub", " CNTR ", " CENTRE "),
    ("sub", " PO ", " POST OFFICE "), ("sub", " P.O ", " POST OFFICE "),
    ("sub", " IND ", " INDUSTRIAL "), ("sub", " INDL ", " INDUSTRIAL "),
    ("sub", " PH ", " PUBLIC HOUSE "), ("sub", " P.H ", " PUBLIC HOUSE "),
    ("sub", " CH ", " CHURCH "), ("sub", " SCH ", " SCHOOL "),
    ("sub", " HOSP ", " HOSPITAL "), ("sub", " UNI ", " UNIVERSITY "),
    ("sub", " STN ", " STATION "), ("sub", " STA ", " STATION "),
    ("sub", " HANTS ", " HAMPSHIRE "), ("suffix", " HANTS", " HAMPSHIRE"),
)

_NOISE: tuple[tuple[str, str], ...] = (
    ("sub", " THE "), ("prefix", "THE "),
    ("sub", " OF "), ("sub", " NEAR "), ("sub", " OPPOSITE "),
    ("sub", " OPP "), ("sub", " ADJ "), ("sub", " ADJACENT "),
    ("sub", " BEHIND "), ("sub", " FRONT "), ("sub", " REAR "), ("sub", " SIDE "),
)

_BUSINESS: tuple[tuple[str, str], ...] = (
    ("CO-OP", "COOPERATIVE"), ("COOP", "COOPERATIVE"), ("CO OP", "COOPERATIVE"),
    ("TESCO'S", "TESCO"), ("SAINSBURY'S", "SAINSBURYS"), ("SAINSBURY", "SAINSBURYS"),
    ("MCDONALD'S", "MCDONALDS"), ("MARKS & SPENCER", "MARKS AND SPENCER"),
    ("M&S", "MARKS AND SPENCER"), ("B&Q", "B AND Q"),
    ("BARCLAYS BANK", "BARCLAYS"), ("LLOYDS BANK", "LLOYDS"),
    ("HSBC BANK", "HSBC"), ("NATWEST BANK", "NATWEST"),
)

_PUNCT_DROP = ("'", '"', "`")
_PUNCT_SPACE = ("-", "_", ",", ".", ";", ":", "!", "?", "(", ")", "[", "]", "{", "}", "/", "\\")


def expand_abbreviations(address: str) -> str:
    """enhanced.go:57-174, fixed source-literal order."""
    out = address
    for kind, pat, rep in _ABBREV:
        if kind == "sub":
            out = out.replace(pat, rep)
        elif kind == "prefix":
            out = re.sub("^" + pat, rep, out)
        else:
            out = re.sub(re.escape(pat) + "$", rep, out)
    return out


def remove_noise_words(address: str) -> str:
    """enhanced.go:196-223."""
    out = address
    for kind, pat in _NOISE:
        if kind == "prefix":
            out = re.sub("^" + re.escape(pat), "", out)
        else:
            out = out.replace(pat, " ")
    return out


def normalize_business_names(address: str) -> str:
    """enhanced.go:226-250.  The Go code iterates an (unordered) map of
    plain substring replaces whose rules interact ("COOPERATIVE" contains
    "COOP", so a later "COOP" rule corrupts an earlier expansion) — the
    reference's output is literally nondeterministic there.  We fix the
    source order AND guard each rule with word boundaries so an expansion
    is never re-matched (documented divergence-for-determinism)."""
    out = address
    for variant, standard in _BUSINESS:
        out = re.sub(r"(?<![A-Z0-9])" + re.escape(variant) + r"(?![A-Z0-9])", standard, out)
    return out


def clean_punctuation(address: str) -> str:
    """enhanced.go:253-273: drop quotes, punctuation -> space, & -> AND."""
    out = address
    for ch in _PUNCT_DROP:
        out = out.replace(ch, "")
    for ch in _PUNCT_SPACE:
        out = out.replace(ch, " ")
    return out.replace("&", " AND ")


def enhanced_canonical_address(raw: str) -> tuple[str, str, list[str]]:
    """M2 pipeline (enhanced.go:24-52).  Postcode extraction reuses the
    M1 regex (the enhanced variant's own extractPostcode matches the same
    pattern class)."""
    if not raw:
        return "", "", []
    _, postcode, _ = canonical_address(raw)  # postcode only (spaces stripped)
    s = raw
    if postcode:
        # remove the postcode occurrence(s) (spaced or not)
        s = re.sub(
            r"\b[A-Za-z]{1,2}\d[\dA-Za-z]?\s*\d[ABD-HJLNP-UW-Zabd-hjlnp-uw-z]{2}\b",
            " ",
            s,
        )
    s = s.strip().upper()
    s = expand_abbreviations(s)
    s = remove_noise_words(s)
    s = normalize_business_names(s)
    s = clean_punctuation(s)
    s = re.sub(r"\s+", " ", s).strip()
    return s, postcode, s.split(" ") if s else []


def char_containment_similarity(s1: str, s2: str) -> float:
    """The reference's "jaroWinklerSimilarity" (enhanced.go:401-419) is
    actually per-byte containment — ported as-is (divergence from the
    name documented in SURVEY.md §2.9)."""
    if s1 == s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    matches = sum(1 for ch in s1 if ch in s2)
    return matches / max(len(s1), len(s2))


def partial_string_match(s1: str, s2: str) -> float:
    """Token Jaccard (enhanced.go:429-462): duplicates in s1 each count
    (inner break only dedups against s2 membership)."""
    if s1 == s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    t1 = s1.upper().split()
    t2 = s2.upper().split()
    if not t1 or not t2:
        return 0.0
    set2 = set(t2)
    matches = sum(1 for t in t1 if t in set2)
    total = len(t1) + len(t2) - matches
    return matches / total if total else 0.0


def match_by_components(source: dict[str, str], target: dict[str, str]) -> float:
    """MatchByComponents (enhanced.go:346-398): weighted component blend
    normalized by the weights of populated components."""
    score = 0.0
    weights = 0.0
    sp, tp = source.get("postcode", ""), target.get("postcode", "")
    if sp and tp:
        if sp == tp:
            score += 0.35
        elif len(sp) >= 4 and len(tp) >= 4 and sp[:4] == tp[:4]:
            score += 0.20
        elif len(sp) >= 2 and len(tp) >= 2 and sp[:2] == tp[:2]:
            score += 0.10
        weights += 0.35
    sh, th = source.get("house_number", ""), target.get("house_number", "")
    if sh and th:
        if sh == th:
            score += 0.25
        weights += 0.25
    ss, ts = source.get("road", ""), target.get("road", "")
    if ss and ts:
        score += 0.20 * char_containment_similarity(ss, ts)
        weights += 0.20
    st, tt = source.get("city", ""), target.get("city", "")
    if st and tt:
        if st == tt:
            score += 0.15
        weights += 0.15
    sn, tn = source.get("house_name", ""), target.get("house_name", "")
    if sn and tn:
        score += 0.05 * char_containment_similarity(sn, tn)
        weights += 0.05
    return score / weights if weights > 0 else 0.0
