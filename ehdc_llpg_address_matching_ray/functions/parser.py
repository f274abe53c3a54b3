"""M7 — full UK AddressParser port (internal/validation/parser.go:23-500,
config internal/validation/types.go:185-215).

Structured component extraction with unit/flat/estate handling, the
street-vs-locality comma heuristic, per-component validation with
confidence factors, and the vague-address gate.  Pure functions over
strings — used per row inside ``map_batches`` (stateless, regexes
compiled at module import, once per worker process).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# parser.go:28-33 — compiled patterns
UNIT_PATTERN = re.compile(r"\b(UNIT[,\s]+\d+[A-Z]?)\b", re.IGNORECASE)
FLAT_PATTERN = re.compile(r"\b(FLAT[,\s]+[A-Z0-9]+)\b", re.IGNORECASE)
ESTATE_PATTERN = re.compile(r"\b(INDUSTRIAL\s+ESTATE?|IND\s+EST)\b", re.IGNORECASE)
POSTCODE_PATTERN = re.compile(r"\b([A-Z]{1,2}\d{1,2}[A-Z]?\s*\d[A-Z]{2})\b", re.IGNORECASE)
HOUSE_NUM_PATTERN = re.compile(r"^\s*(\d+[A-Z]?)\b", re.IGNORECASE)

# types.go:185-210 — DefaultParsingConfig
STREET_TYPE_ABBREVIATIONS = {
    "RD": "ROAD", "ST": "STREET", "AVE": "AVENUE", "CRESC": "CRESCENT",
    "CRES": "CRESCENT", "CL": "CLOSE", "CLS": "CLOSE", "CT": "COURT",
    "DR": "DRIVE", "GDNS": "GARDENS", "GDN": "GARDEN", "LN": "LANE",
    "PK": "PARK", "PL": "PLACE", "SQ": "SQUARE", "TER": "TERRACE",
    "WY": "WAY", "WLK": "WALK", "EST": "ESTATE", "IND": "INDUSTRIAL",
}
COUNTY_ABBREVIATIONS = {"HANTS": "HAMPSHIRE"}
MIN_OVERALL_CONFIDENCE = 0.6  # types.go:213

STREET_INDICATORS = [
    "ROAD", "STREET", "LANE", "AVENUE", "DRIVE", "CLOSE", "COURT",
    "PLACE", "WAY", "ESTATE", "INDUSTRIAL",
]  # parser.go:152

LOCALITY_INDICATORS = [
    "ALTON", "LISS", "PETERSFIELD", "BORDON", "GRAYSHOTT", "HEADLEY",
    "WATERLOOVILLE", "HORNDEAN", "HAMPSHIRE", "HANTS",
    "FIELD", "FORD", "TON", "HAM", "BURY", "WORTH", "STEAD",
]  # parser.go:460-467

VAGUE_PHRASES = [
    "LAND AT", "SITE OF", "REAR OF", "ADJACENT TO", "ADJOINING",
    "NORTH OF", "SOUTH OF", "EAST OF", "WEST OF",
]  # parser.go:361-364

_HOUSE_VALID_PATTERNS = [
    re.compile(r"^\d+[A-Z]?$"),
    re.compile(r"^UNIT\s+\d+[A-Z]?$", re.IGNORECASE),
    re.compile(r"^FLAT\s+[A-Z0-9]+$", re.IGNORECASE),
    re.compile(r"^SUITE\s+\d+[A-Z]?$", re.IGNORECASE),
    re.compile(r"^\d+[A-Z]?[-/]\d+[A-Z]?$"),
]  # parser.go:308-314

_UK_POSTCODE = re.compile(r"^[A-Z]{1,2}\d{1,2}[A-Z]?\s*\d[A-Z]{2}$")
_WS = re.compile(r"\s+")
_NUM_TOKEN = re.compile(r"(\d+[A-Z]?)")
_ALNUM_TOKEN = re.compile(r"([A-Z0-9]+)")


@dataclass
class AddressComponents:
    """AddressComponents (types.go) — the parse result."""

    raw: str = ""
    house_number: str = ""
    sub_building: str = ""
    building: str = ""
    street: str = ""
    locality: str = ""
    postcode: str = ""
    extraction_method: str = "regex_fallback"
    extraction_confidence: float = 0.0
    is_valid_for_matching: bool = False
    validation_issues: list[str] = field(default_factory=list)

    def has_house_number(self) -> bool:
        return self.house_number != ""

    def has_street(self) -> bool:
        return len(self.street) >= 3


def preprocess_address(address: str) -> str:
    """parser.go:65-87: uppercase, expand street/county abbreviations."""
    cleaned = address.strip().upper()
    for abbrev, full in STREET_TYPE_ABBREVIATIONS.items():
        cleaned = re.sub(rf"\b{re.escape(abbrev)}\b", full, cleaned)
    for abbrev, full in COUNTY_ABBREVIATIONS.items():
        cleaned = re.sub(rf"\b{re.escape(abbrev)}\b", full, cleaned)
    return _WS.sub(" ", cleaned).strip()


def _normalize_unit_number(unit_match: str) -> str:
    m = _NUM_TOKEN.search(unit_match)
    return m.group(1) if m else unit_match


def _normalize_flat_number(flat_match: str) -> str:
    matches = _ALNUM_TOKEN.findall(flat_match.upper())
    if len(matches) > 1:
        return matches[1]
    return flat_match


def looks_like_locality(part: str) -> bool:
    """parser.go:455-479."""
    upper = part.upper()
    for ind in LOCALITY_INDICATORS:
        if ind in upper:
            return True
    return " " not in part and len(part) <= 12


def _parse_core(address: str) -> AddressComponents:
    """parser.go:91-181 — the regex 'gopostal fallback' parser."""
    c = AddressComponents(raw=address)
    upper_addr = address.upper()

    unit_match = UNIT_PATTERN.search(upper_addr)
    flat_match = FLAT_PATTERN.search(upper_addr)
    if unit_match:
        c.house_number = _normalize_unit_number(unit_match.group(1).strip())
    elif flat_match:
        c.house_number = _normalize_flat_number(flat_match.group(1).strip())
    else:
        hm = HOUSE_NUM_PATTERN.match(address)
        if hm:
            c.house_number = hm.group(1).strip()

    pm = POSTCODE_PATTERN.search(address)
    if pm:
        c.postcode = pm.group(1).strip()

    street_part = address
    if c.house_number:
        if street_part.upper().startswith(c.house_number.upper()):
            street_part = street_part[len(c.house_number):]
        street_part = street_part.removeprefix(",").strip()
    if c.postcode:
        street_part = street_part.removesuffix(c.postcode)
        street_part = street_part.removesuffix(",").strip()

    parts = street_part.split(",")
    street_parts: list[str] = []
    locality_parts: list[str] = []
    for i, part in enumerate(parts):
        part = part.strip()
        if not part:
            continue
        upper_part = part.upper()
        has_street_indicator = any(ind in upper_part for ind in STREET_INDICATORS)
        if has_street_indicator:
            street_parts.append(part)
        elif i >= len(parts) - 2 and (len(part) <= 15 or looks_like_locality(part)):
            locality_parts.append(part)
        else:
            street_parts.append(part)

    if street_parts:
        c.street = ", ".join(street_parts)
    if locality_parts:
        c.locality = ", ".join(locality_parts)
    return c


def _postprocess(c: AddressComponents, original: str) -> AddressComponents:
    """parser.go:184-238 — UK fixups over the core parse."""
    if not c.house_number or not c.sub_building:
        um = UNIT_PATTERN.search(original)
        if um:
            if not c.house_number:
                c.house_number = um.group(1).strip()
            elif not c.sub_building:
                c.sub_building = um.group(1).strip()
        fm = FLAT_PATTERN.search(original)
        if fm:
            if not c.house_number:
                c.house_number = fm.group(1).strip()
            elif not c.sub_building:
                c.sub_building = fm.group(1).strip()

    if ESTATE_PATTERN.search(original):
        if "INDUSTRIAL" in c.street.upper():
            pass
        elif "INDUSTRIAL" in original.upper():
            for part in original.split(","):
                if ESTATE_PATTERN.search(part):
                    c.building = part.strip()
                    break

    if not c.postcode:
        pm = POSTCODE_PATTERN.search(original)
        if pm:
            c.postcode = pm.group(1).strip()
    if not c.house_number:
        hm = HOUSE_NUM_PATTERN.match(original)
        if hm:
            c.house_number = hm.group(0).strip()
    return c


def is_valid_house_number(house_num: str) -> bool:
    """parser.go:301-325."""
    if not house_num:
        return False
    return any(p.match(house_num) for p in _HOUSE_VALID_PATTERNS)


def is_valid_uk_postcode(postcode: str) -> bool:
    """parser.go:328-338."""
    if not postcode:
        return False
    return bool(_UK_POSTCODE.match(postcode.strip().upper()))


def _validate(c: AddressComponents) -> AddressComponents:
    """parser.go:241-299 — confidence factors + issues."""
    issues: list[str] = []
    factors: list[float] = []

    if not c.house_number:
        issues.append("No house number identified")
        factors.append(0.0)
    elif is_valid_house_number(c.house_number):
        factors.append(1.0)
    else:
        issues.append(f"Questionable house number: {c.house_number}")
        factors.append(0.5)

    if not c.street:
        issues.append("No street name identified")
        factors.append(0.0)
    elif len(c.street) < 3:
        issues.append("Street name too short")
        factors.append(0.3)
    else:
        factors.append(1.0)

    if not c.postcode:
        issues.append("No postcode identified")
        factors.append(0.0)
    elif is_valid_uk_postcode(c.postcode):
        factors.append(1.0)
    else:
        issues.append(f"Invalid UK postcode format: {c.postcode}")
        factors.append(0.2)

    if not c.locality:
        issues.append("No locality identified")
        factors.append(0.5)  # not critical
    else:
        factors.append(1.0)

    if factors:
        c.extraction_confidence = sum(factors) / len(factors)
    c.validation_issues = issues
    c.is_valid_for_matching = (
        c.extraction_confidence >= MIN_OVERALL_CONFIDENCE
        and c.has_house_number()
        and c.has_street()
    )
    return c


def parse_address(address: str) -> AddressComponents:
    """ParseAddress (parser.go:37-62)."""
    if not address:
        return AddressComponents(
            raw=address or "",
            extraction_method="empty",
            validation_issues=["Empty address"],
        )
    cleaned = preprocess_address(address)
    c = _parse_core(cleaned)
    c = _postprocess(c, address)
    return _validate(c)


@dataclass
class AddressValidation:
    address: str
    components: AddressComponents
    issues: list[str]
    suitable: bool
    score: float


def validate_address_for_matching(address: str) -> AddressValidation:
    """ValidateAddressForMatching (parser.go:341-380): parse + the
    matching-specific gates incl. the vague-address phrases."""
    c = parse_address(address)
    v = AddressValidation(
        address=address,
        components=c,
        issues=list(c.validation_issues),
        suitable=c.is_valid_for_matching,
        score=c.extraction_confidence,
    )
    if not c.has_house_number():
        v.issues.append("Missing house number - required for precise matching")
        v.suitable = False
    if not c.has_street():
        v.issues.append("Missing or invalid street name")
        v.suitable = False
    upper = address.upper()
    for phrase in VAGUE_PHRASES:
        if phrase in upper:
            v.issues.append(f"Vague address contains '{phrase}'")
            v.suitable = False
            v.score *= 0.5
            break
    return v


def normalize_street_name(street: str) -> str:
    """parser.go:408-437."""
    normalized = street.strip().upper()
    for pattern in (
        r"\bUNIT[,\s]+\d+[A-Z]?\b[,\s]*",
        r"\bFLAT[,\s]+[A-Z0-9]+\b[,\s]*",
        r"\bSUITE[,\s]+\d+[A-Z]?\b[,\s]*",
    ):
        normalized = re.sub(pattern, "", normalized, flags=re.IGNORECASE)
    for abbrev, full in STREET_TYPE_ABBREVIATIONS.items():
        normalized = re.sub(rf"\b{re.escape(abbrev)}\b", full, normalized)
    normalized = re.sub(r"\s*,\s*", ", ", normalized)
    normalized = _WS.sub(" ", normalized)
    normalized = re.sub(r"^[,\s]+|[,\s]+$", "", normalized)
    return normalized.strip()


def normalize_postcode(postcode: str) -> str:
    """parser.go:440-453: strip spaces, re-insert before final 3 chars."""
    normalized = postcode.strip().upper().replace(" ", "")
    if len(normalized) >= 5:
        pos = len(normalized) - 3
        normalized = normalized[:pos] + " " + normalized[pos:]
    return normalized
