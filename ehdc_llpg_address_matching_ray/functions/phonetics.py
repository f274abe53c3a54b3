"""Simplified Double-Metaphone port.

Reference: /root/reference internal/phonetics/metaphone.go:16-80.
The Go code iterates its replacement map in randomized order; we fix the
source-literal order (the pairs only interact on contrived inputs like
"QUH" — documented divergence, deterministic here).
"""

from __future__ import annotations

_REPLACEMENTS: tuple[tuple[str, str], ...] = (
    ("PH", "F"),
    ("GH", "F"),
    ("CK", "K"),
    ("QU", "KW"),
    ("TH", "0"),  # theta
    ("SH", "X"),
    ("CH", "X"),
    ("WH", "W"),
    ("KN", "N"),
    ("WR", "R"),
)

_VOWELS = frozenset("AEIOUY")


def metaphone(text: str) -> str:
    """Primary (== secondary) simplified metaphone code, ≤4 chars
    (metaphone.go:16-73)."""
    t = text.strip().upper()
    if not t:
        return ""
    for pat, rep in _REPLACEMENTS:
        t = t.replace(pat, rep)
    if len(t) > 1:
        first, rest = t[0], t[1:]
        rest = "".join(ch for ch in rest if ch not in _VOWELS)
        t = first + rest
    # Remove duplicate consecutive letters
    out = []
    last = None
    for ch in t:
        if ch != last:
            out.append(ch)
            last = ch
    code = "".join(out)
    return code[:4]


def phonetic_match(t1: str, t2: str) -> bool:
    """metaphone.go:76-80."""
    p1, p2 = metaphone(t1), metaphone(t2)
    return p1 != "" and p2 != "" and p1 == p2


def count_phonetic_matches(tokens1: list[str], tokens2: list[str]) -> int:
    """Port of countPhoneticMatches (internal/match/features.go:319-334):
    each token1 counts at most once."""
    if not tokens1 or not tokens2:
        return 0
    codes2 = {metaphone(t) for t in tokens2}
    codes2.discard("")
    matches = 0
    for t1 in tokens1:
        c1 = metaphone(t1)
        if c1 and c1 in codes2:
            matches += 1
    return matches
