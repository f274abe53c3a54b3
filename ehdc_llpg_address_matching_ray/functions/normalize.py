"""Canonical text normalization — port of the reference normalizer spec.

Reference: /root/reference internal/normalize/address.go
- ``CanonicalAddressDebug``  address.go:131-192  (the pipeline order)
- abbreviation rules         address.go:27-59
- postcode regex             address.go:75   (extracted value strips spaces, :144)
- punctuation policy         address.go:150-158 (keep letters/digits/space, else ' ')
- descriptor handling        address.go:195-217
- house numbers              address.go:78,220-236
- locality tokens            address.go:84-122,239-258
- street tokenization        address.go:261-294
- token overlap              address.go:303-330

Two implementations that MUST agree byte-for-byte (tested):

- ``canonical_address(s)``   — scalar pure-Python oracle.
- ``canonical_batch(arr)``   — vectorized Arrow (RE2 kernels), used in the
                               map_batches normalize stage.

Determinism notes (divergences from the literal Go binary, documented per
SURVEY.md §2.9 / FIXTURES.md §3):
- The Go code iterates rule *maps* (randomized order).  We fix the order
  to the source-literal order; the rule set is non-interacting under word
  boundaries so results agree with any Go iteration order.
- Go ``regexp`` and Arrow's regex engine are both RE2, so ``\\b`` and all
  patterns have identical semantics in the vectorized path.  The scalar
  path uses Python ``re`` whose ``\\b``/``\\s`` are unicode-aware; this
  only diverges for postcodes adjacent to non-ASCII letters, which do not
  occur (postcodes are ASCII by construction).  The parity test covers
  non-ASCII rows.
- The reference's own unit test expects a spaced postcode ("GU34 1AA")
  but the code strips spaces (address.go:144 vs address_test.go:18); we
  follow the CODE (stripped).
"""

from __future__ import annotations

import re
import sys
import unicodedata

import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# Rule tables (address.go:27-59, source-literal order)
# ---------------------------------------------------------------------------

ABBREV_RULES: tuple[tuple[str, str], ...] = (
    (r"\bRD\b", "ROAD"),
    (r"\bST\b", "STREET"),  # but keep SAINT separate
    (r"\bAVE\b", "AVENUE"),
    (r"\bGDNS\b", "GARDENS"),
    (r"\bCT\b", "COURT"),
    (r"\bDR\b", "DRIVE"),
    (r"\bLN\b", "LANE"),
    (r"\bPL\b", "PLACE"),
    (r"\bSQ\b", "SQUARE"),
    (r"\bCRES\b", "CRESCENT"),
    (r"\bTER\b", "TERRACE"),
    (r"\bCL\b", "CLOSE"),
    (r"\bPK\b", "PARK"),
    (r"\bGRN\b", "GREEN"),
    (r"\bWY\b", "WAY"),
    (r"\bAPT\b", "APARTMENT"),
    (r"\bFLT\b", "FLAT"),
    (r"\bBLDG\b", "BUILDING"),
    (r"\bHSE\b", "HOUSE"),
    (r"\bCTG\b", "COTTAGE"),
    (r"\bFM\b", "FARM"),
    (r"\bMNR\b", "MANOR"),
    (r"\bVIL\b", "VILLA"),
    (r"\bEST\b", "ESTATE"),
    (r"\bINDL\b", "INDUSTRIAL"),
    (r"\bCTR\b", "CENTRE"),
    (r"\bCENTRE\b", "CENTRE"),  # normalize spelling (no-op, kept for parity)
    (r"\bNTH\b", "NORTH"),
    (r"\bSTH\b", "SOUTH"),
    (r"\bE\b", "EAST"),
    (r"\bWST\b", "WEST"),
)

# address.go:195-208, source-literal order.  Identity rules are no-ops but
# kept for parity; PROPOSED/FORMER are deletions.
DESCRIPTOR_RULES: tuple[tuple[str, str], ...] = (
    (r"\bLAND AT\b", "LAND AT"),
    (r"\bLAND ADJ TO\b", "LAND ADJACENT TO"),
    (r"\bLAND ADJACENT\b", "LAND ADJACENT TO"),
    (r"\bREAR OF\b", "REAR OF"),
    (r"\bPLOT\b", "PLOT"),
    (r"\bPARCEL\b", "PARCEL"),
    (r"\bSITE\b", "SITE"),
    (r"\bDEVELOPMENT\b", "DEVELOPMENT"),
    (r"\bPROPOSED\b", ""),
    (r"\bFORMER\b", ""),
)

# address.go:75 — UK postcode.  Named group for Arrow extract_regex.
POSTCODE_PATTERN = (
    r"\b([A-Za-z]{1,2}\d[\dA-Za-z]?\s*\d[ABD-HJLNP-UW-Zabd-hjlnp-uw-z]{2})\b"
)
_POSTCODE_NAMED = POSTCODE_PATTERN.replace("(", "(?P<pcx>", 1)

# address.go:78 — house numbers
HOUSE_NUMBER_PATTERN = r"\b(\d+[A-Za-z]?)\b"
# address.go:81 — flat/unit
FLAT_UNIT_PATTERN = r"\b(FLAT|APT|APARTMENT|UNIT|STUDIO)\s+(\d+[A-Za-z]?)\b"

# address.go:84-122 — 38-town locality gazetteer
LOCALITY_TOKENS: frozenset[str] = frozenset(
    {
        "ALTON", "PETERSFIELD", "LIPHOOK", "WATERLOOVILLE", "HORNDEAN",
        "BORDON", "WHITEHILL", "GRAYSHOTT", "HEADLEY", "BRAMSHOTT",
        "LINDFORD", "HOLLYWATER", "PASSFIELD", "CONFORD", "FOUR MARKS",
        "MEDSTEAD", "CHAWTON", "SELBORNE", "EMPSHOTT", "HAWKLEY", "LISS",
        "STEEP", "STROUD", "BURITON", "LANGRISH", "EAST MEON", "WEST MEON",
        "FROXFIELD", "PRIVETT", "ROPLEY", "WEST TISTED", "EAST TISTED",
        "BINSTED", "HOLT POUND", "BENTLEY", "FARNHAM", "HASLEMERE",
    }
)
_MULTIWORD_LOCALITIES = tuple(sorted(t for t in LOCALITY_TOKENS if " " in t))

# address.go:265-270 — street tokenization stopwords
STREET_SKIP_WORDS: frozenset[str] = frozenset(
    {
        "FLAT", "APT", "APARTMENT", "UNIT", "STUDIO",
        "THE", "AND", "OF", "AT", "IN", "ON",
        "LAND", "REAR", "ADJACENT", "TO", "PLOT",
        "SITE", "DEVELOPMENT", "PARCEL",
    }
)

# ---------------------------------------------------------------------------
# Go-compatible character classes
# ---------------------------------------------------------------------------
# unicode.IsSpace = White_Space property: control spaces + NEL + Zs/Zl/Zp.
_GO_SPACE_ASCII = "\t\n\v\f\r \x85\xa0"


def _is_go_space(ch: str) -> bool:
    if ch in _GO_SPACE_ASCII:
        return True
    return unicodedata.category(ch) in ("Zs", "Zl", "Zp")


def _keep_char(ch: str) -> bool:
    """unicode.IsLetter || unicode.IsDigit || unicode.IsSpace (address.go:152)."""
    cat = unicodedata.category(ch)
    if cat.startswith("L") or cat == "Nd":
        return True
    return _is_go_space(ch)


# RE2 class equivalent to _is_go_space for the Arrow path.
_RE2_SPACE_CLASS = r"\t\n\v\f\r \x{0085}\p{Zs}\p{Zl}\p{Zp}"
_RE2_NONKEEP = rf"[^\p{{L}}\p{{Nd}}{_RE2_SPACE_CLASS}]"
_RE2_SPACE_RUN = rf"[{_RE2_SPACE_CLASS}]+"

def _re2_compat(pattern: str) -> str:
    """Rewrite a RE2 pattern for Python ``re`` with RE2 semantics.

    RE2 (the engine behind both Go ``regexp`` and Arrow's string kernels)
    defines ``\\b`` on ASCII word chars ``[0-9A-Za-z_]`` and ``\\s`` as
    ``[\\t\\n\\f\\r ]``; Python ``re`` treats both as unicode-aware.  The
    scalar oracle must match the vectorized Arrow path byte-for-byte, so
    we emulate RE2's definitions with lookarounds / explicit classes.
    """
    out = pattern.replace(r"\b", r"(?:(?<![0-9A-Za-z_])(?=[0-9A-Za-z_])|(?<=[0-9A-Za-z_])(?![0-9A-Za-z_]))")
    out = out.replace(r"\s", "[\t\n\f\r ]")
    return out


_re_postcode = re.compile(_re2_compat(POSTCODE_PATTERN))
_re_abbrev = tuple((re.compile(_re2_compat(p)), r) for p, r in ABBREV_RULES)
_re_descr = tuple((re.compile(_re2_compat(p)), r) for p, r in DESCRIPTOR_RULES)
_re_house = re.compile(_re2_compat(HOUSE_NUMBER_PATTERN))
_re_flat = re.compile(_re2_compat(FLAT_UNIT_PATTERN))


def _fields_join(s: str) -> str:
    """strings.Join(strings.Fields(s), " ") — split on Go whitespace."""
    out: list[str] = []
    cur: list[str] = []
    for ch in s:
        if _is_go_space(ch):
            if cur:
                out.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return " ".join(out)


def _trim_space(s: str) -> str:
    start, end = 0, len(s)
    while start < end and _is_go_space(s[start]):
        start += 1
    while end > start and _is_go_space(s[end - 1]):
        end -= 1
    return s[start:end]


# ---------------------------------------------------------------------------
# Scalar oracle
# ---------------------------------------------------------------------------

def canonical_address(raw: str) -> tuple[str, str, list[str]]:
    """Scalar port of CanonicalAddressDebug (address.go:131-192).

    Returns (canonical, postcode, tokens); postcode has spaces stripped
    (address.go:144).
    """
    if raw is None or raw == "":
        return "", "", []

    # Uppercase via the SAME utf8proc kernel as the vectorized path so the
    # two are byte-identical (Python str.upper() diverges on e.g. ß -> SS
    # vs utf8proc's ß -> ẞ; the reference's Go ToUpper keeps ß — non-ASCII
    # case mapping is a documented divergence, SURVEY.md §7.5).
    s = pc.utf8_upper(pc.utf8_trim_whitespace(pa.array([raw], pa.string())))[0].as_py()

    # Extract first postcode, remove all occurrences (address.go:143-147)
    postcode = ""
    m = _re_postcode.search(s)
    if m:
        postcode = m.group(0).replace(" ", "")
        s = _re_postcode.sub(" ", s)

    # Punctuation -> space, keep letters/digits/spaces (address.go:150-158)
    s = "".join(ch if _keep_char(ch) else " " for ch in s)
    s = _fields_join(s)

    # Abbreviation expansion (address.go:161-164)
    for rx, rep in _re_abbrev:
        s = rx.sub(rep, s)

    # (SymSpell correction is optional and default-off: symspell/types.go
    #  Enabled:false. See functions/symspell.py for the opt-in stage.)

    # Descriptor handling (address.go:181, :195-217)
    for rx, rep in _re_descr:
        s = rx.sub(rep, s)
    s = _trim_space(s)

    # Final collapse (address.go:185)
    s = _fields_join(s)
    tokens = s.split(" ") if s else []
    return s, postcode, tokens


def extract_house_numbers(text: str) -> list[str]:
    """Port of ExtractHouseNumbers (address.go:220-236)."""
    if not text:
        return []
    numbers = _re_house.findall(text)
    for m in _re_flat.finditer(text):
        numbers.append(m.group(2))
    return numbers


def extract_locality_tokens(text: str) -> list[str]:
    """Port of ExtractLocalityTokens (address.go:239-258).

    Multi-word localities are appended in sorted order (the Go code
    iterates a map in random order; downstream use is set-based so the
    order is immaterial — we fix it for determinism).
    """
    if not text:
        return []
    upper = text.upper()
    localities = [t for t in upper.split() if t in LOCALITY_TOKENS]
    for loc in _MULTIWORD_LOCALITIES:
        if loc in upper:
            localities.append(loc)
    return localities


def tokenize_street(text: str) -> list[str]:
    """Port of TokenizeStreet (address.go:261-294)."""
    if not text:
        return []
    out = []
    for token in text.upper().split():
        if _re_house.search(token):
            continue
        if token in LOCALITY_TOKENS:
            continue
        if token in STREET_SKIP_WORDS:
            continue
        if len(token) < 2:
            continue
        out.append(token)
    return out


def token_overlap(tokens1: list[str], tokens2: list[str]) -> float:
    """Port of TokenOverlap (address.go:303-330): |∩| / min(|a|,|b|),
    counting duplicates on the second list like the Go code does."""
    if not tokens1 and not tokens2:
        return 1.0
    if not tokens1 or not tokens2:
        return 0.0
    set1 = set(tokens1)
    overlap = sum(1 for t in tokens2 if t in set1)
    return overlap / min(len(tokens1), len(tokens2))


# ---------------------------------------------------------------------------
# Vectorized Arrow path (RE2 kernels — same engine family as Go regexp)
# ---------------------------------------------------------------------------

def canonical_batch(arr: pa.Array | pa.ChunkedArray) -> tuple[pa.Array, pa.Array]:
    """Vectorized canonicalization: returns (canonical, postcode) arrays.

    Byte-identical to ``canonical_address`` per row (asserted in
    tests/test_normalize.py over ASCII and non-ASCII corpora).
    """
    s = pc.utf8_upper(pc.utf8_trim_whitespace(arr))
    # utf8_trim_whitespace trims the unicode White_Space set, matching
    # Go strings.TrimSpace; the parity test guards this.

    # Postcode: first match extracted (spaces stripped), all matches removed.
    extracted = pc.extract_regex(s, _POSTCODE_NAMED)
    postcode = pc.replace_substring(
        pc.coalesce(pc.struct_field(extracted, "pcx"), ""), " ", ""
    )
    s = pc.replace_substring_regex(s, POSTCODE_PATTERN, " ")

    # Punctuation -> space
    s = pc.replace_substring_regex(s, _RE2_NONKEEP, " ")
    # Fields-collapse
    s = pc.utf8_trim(pc.replace_substring_regex(s, _RE2_SPACE_RUN, " "), characters=" ")

    # Abbreviations
    for pat, rep in ABBREV_RULES:
        s = pc.replace_substring_regex(s, pat, rep)

    # Descriptors
    for pat, rep in DESCRIPTOR_RULES:
        s = pc.replace_substring_regex(s, pat, rep)

    # Final collapse
    s = pc.utf8_trim(pc.replace_substring_regex(s, _RE2_SPACE_RUN, " "), characters=" ")

    # Empty input -> empty output (scalar returns "" for "")
    s = pc.coalesce(s, "")
    return s, postcode


def tokens_from_canonical(canonical: pa.Array | pa.ChunkedArray) -> pa.Array:
    """list<string> token column: whitespace split of the canonical text."""
    # canonical is single-space separated and trimmed; split on ' '.
    if isinstance(canonical, pa.ChunkedArray):
        canonical = canonical.combine_chunks()
    toks = pc.split_pattern(canonical, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    # "" splits to [""] — replace with [] to match the scalar path.
    empty = pc.equal(canonical, "")
    empty_lists = pa.array([[]] * len(toks), type=toks.type)
    return pc.if_else(empty, empty_lists, toks)
