"""Component-level matching kernels (the "fixed component engine"
family): M6 component extraction, M10 real-address predicate, P4
component scoring with the house-number veto, D3 decision matrix.

Reference provenance (/root/reference):
- extractAddressComponents  internal/normalize/enhanced.go:287-343
- is_real_address           plpgsql at cmd/matcher-v2/main.go:766-793
- calculateValidatedScore   internal/matcher/engine_components_fixed.go:602-686
- makeValidatedDecision     internal/matcher/engine_components_fixed.go:732-763
- quality filters (M11)     cmd/matcher-v2/parallel_layer2.go:50-61
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .normalize import LOCALITY_TOKENS, POSTCODE_PATTERN, token_overlap

_HOUSE_PREFIX = re.compile(r"^(\d+[A-Z]?)\s+")
_STREET_TYPE = re.compile(
    r"\b([A-Z ]+?(?:ROAD|STREET|LANE|AVENUE|CLOSE|DRIVE|WAY|COURT|PLACE|"
    r"CRESCENT|GARDENS|GROVE|TERRACE|SQUARE|HILL|PARK|GREEN|RISE|WALK|MEWS))\b"
)
_PC = re.compile(POSTCODE_PATTERN)
_PLANNING_REF = re.compile(r"^[A-Z]{1,3}[0-9]+/?[0-9]*$")
_ADDRESS_KEYWORD = re.compile(
    r"(street|road|avenue|lane|way|close|drive|court|place|crescent|gardens|"
    r"park|hill|view|house|cottage|farm|manor|hall)",
    re.IGNORECASE,
)
_NON_ADDRESSES = frozenset({"N/A", "NOT APPLICABLE", "NONE", "NULL", "TBC"})


def extract_address_components(text: str) -> dict[str, str]:
    """M6 (enhanced.go:287-343): house number by leading-number regex,
    town by gazetteer membership, street by street-type-suffix regex,
    postcode by the M1 pattern."""
    out = {"house_number": "", "road": "", "city": "", "postcode": ""}
    if not text:
        return out
    up = " ".join(text.upper().split())
    m = _HOUSE_PREFIX.match(up)
    if m:
        out["house_number"] = m.group(1)
    pm = _PC.search(up)
    if pm:
        out["postcode"] = pm.group(0).replace(" ", "")
    sm = _STREET_TYPE.search(up)
    if sm:
        street = sm.group(1).strip()
        if out["house_number"] and street.startswith(out["house_number"] + " "):
            street = street[len(out["house_number"]) + 1 :]
        out["road"] = street
    for tok in up.replace(",", " ").split():
        if tok in LOCALITY_TOKENS:
            out["city"] = tok
            break
    return out


def is_real_address(text: str | None) -> bool:
    """M10 (cmd/matcher-v2/main.go:766-793): length >= 10 after trim, not
    a planning-reference code, not an N/A-ish token, and carrying a
    street keyword or a comma."""
    if text is None or len(text.strip()) < 10:
        return False
    t = text.strip()
    if _PLANNING_REF.match(t):
        return False
    if t.upper() in _NON_ADDRESSES:
        return False
    return bool(_ADDRESS_KEYWORD.search(t) or "," in t)


def passes_quality_filters(text: str | None) -> bool:
    """M11 (parallel_layer2.go:50-61): length 15-100, starts with a house
    number, >= 2 commas, excludes PLOT/DEV/F%-style codes."""
    if text is None:
        return False
    t = text.strip()
    if not (15 <= len(t) <= 100):
        return False
    if not re.match(r"^\d", t):
        return False
    if t.count(",") < 2:
        return False
    up = t.upper()
    if up.startswith(("PLOT", "DEV", "F")):
        return False
    return True


@dataclass
class ComponentScore:
    house_number_match: bool = False
    road_match: bool = False
    city_match: bool = False
    postcode_match: bool = False
    matched_count: int = 0
    total_count: int = 0
    overall_score: float = 0.0
    details: dict = field(default_factory=dict)


def component_score(inp: dict[str, str], cand: dict[str, str]) -> ComponentScore:
    """P4 (engine_components_fixed.go:602-686): matched/total component
    ratio, x0.1 (90% penalty) on a house-number mismatch, perfect
    postcode+house => 1.0, postcode boost +0.1 when no house number."""
    s = ComponentScore()
    if inp.get("house_number"):
        s.total_count += 1
        if cand.get("house_number") == inp["house_number"]:
            s.house_number_match = True
            s.matched_count += 1
    if inp.get("road"):
        s.total_count += 1
        if cand.get("road") == inp["road"]:
            s.road_match = True
            s.matched_count += 1
        elif cand.get("road"):
            road_sim = token_overlap(inp["road"].split(), cand["road"].split())
            if road_sim >= 0.8:
                s.road_match = True
                s.matched_count += 1
    if inp.get("city"):
        s.total_count += 1
        if cand.get("city") == inp["city"]:
            s.city_match = True
            s.matched_count += 1
    if inp.get("postcode"):
        s.total_count += 1
        if cand.get("postcode") == inp["postcode"]:
            s.postcode_match = True
            s.matched_count += 1

    if s.total_count > 0:
        base = s.matched_count / s.total_count
        if inp.get("house_number") and cand.get("house_number") and not s.house_number_match:
            base *= 0.1
        s.overall_score = base
        if s.postcode_match and s.house_number_match:
            s.overall_score = 1.0
        elif s.postcode_match and not inp.get("house_number"):
            s.overall_score += 0.1
        s.overall_score = min(1.0, s.overall_score)
    return s


def component_decision(score: ComponentScore | None) -> tuple[str, str]:
    """D3 (engine_components_fixed.go:732-763): postcode+house => accept;
    >=0.95 accept; >=0.8 review; >=0.6 low_confidence; else no_match.
    Returns (decision, mode)."""
    if score is None:
        return "no_match", "auto"
    if score.postcode_match and score.house_number_match:
        return "auto_accept", "auto"
    if score.overall_score >= 0.95:
        return "auto_accept", "auto"
    if score.overall_score >= 0.8:
        return "needs_review", "manual"
    if score.overall_score >= 0.6:
        return "low_confidence", "manual"
    return "no_match", "auto"
