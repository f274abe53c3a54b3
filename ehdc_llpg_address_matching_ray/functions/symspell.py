"""SymSpell symmetric-delete spelling correction — port of the reference.

Reference provenance (/root/reference):
- core algorithm        internal/symspell/symspell.go:22-257
  (deletes index :151-180, lookup :67-139, banded Damerau-Levenshtein
  with early exit :184-257)
- corrector skip rules  internal/symspell/corrector.go:100-143,188-203
  (min length 3, ``^\\d+[A-Z]?$`` house numbers, street-suffix stoplist)
- config defaults       internal/symspell/types.go:40-43
  (MaxEditDistance 2, MinTermLength 3; Enabled false by default)

In the engine the built dictionary is broadcast once via ``ray.put`` and
held by the normalize actor pool (SURVEY.md ST1); this module is pure
Python state with no Ray dependency.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Suggestion:
    term: str
    distance: int
    frequency: int


_HOUSE_NUMBER = re.compile(r"^\d+[A-Z]?$")

STREET_SUFFIXES = frozenset(
    {
        "ROAD", "STREET", "LANE", "CLOSE", "DRIVE", "AVENUE", "GARDENS",
        "COURT", "TERRACE", "WAY", "GROVE", "PLACE", "CRESCENT", "HILL",
        "RISE", "GREEN", "PARK", "SQUARE", "WALK", "MEWS", "PASSAGE",
        "YARD", "ROW", "PARADE",
    }
)


def damerau_levenshtein(a: str, b: str, max_distance: int) -> int:
    """Banded Damerau-Levenshtein with early exit (symspell.go:184-257).
    Returns -1 when the distance exceeds ``max_distance``."""
    len_a, len_b = len(a), len(b)
    if abs(len_a - len_b) > max_distance:
        return -1
    if len_a == 0:
        return len_b
    if len_b == 0:
        return len_a
    if len_a > len_b:
        a, b = b, a
        len_a, len_b = len_b, len_a

    prev = list(range(len_a + 1))
    curr = [0] * (len_a + 1)
    prev_prev = [0] * (len_a + 1)

    for j in range(1, len_b + 1):
        curr[0] = j
        min_dist = j
        bj = b[j - 1]
        for i in range(1, len_a + 1):
            cost = 0 if a[i - 1] == bj else 1
            v = min(prev[i] + 1, curr[i - 1] + 1, prev[i - 1] + cost)
            if i > 1 and j > 1 and a[i - 1] == b[j - 2] and a[i - 2] == bj:
                v = min(v, prev_prev[i - 2] + cost)
            curr[i] = v
            if v < min_dist:
                min_dist = v
        if min_dist > max_distance:
            return -1
        prev_prev, prev, curr = prev, curr, prev_prev

    return prev[len_a] if prev[len_a] <= max_distance else -1


def within_one_edit(a: str, b: str) -> bool:
    """True iff restricted Damerau-Levenshtein distance(a, b) == 1 —
    i.e. ``damerau_levenshtein(a, b, 1) == 1`` — in O(n) via C-speed
    slice comparisons instead of the banded DP (the DP dominated the
    pair scorer's fuzzy-token pass; equivalence is property-tested
    against the ported DP)."""
    la, lb = len(a), len(b)
    if la == lb:
        if a == b:
            return False  # distance 0
        i = 0
        while a[i] == b[i]:
            i += 1
        if a[i + 1 :] == b[i + 1 :]:
            return True  # one substitution
        # one adjacent transposition
        return (
            la - i >= 2
            and a[i] == b[i + 1]
            and a[i + 1] == b[i]
            and a[i + 2 :] == b[i + 2 :]
        )
    if la == lb + 1:
        a, b, la, lb = b, a, lb, la
    elif lb != la + 1:
        return False
    # lb == la + 1: one insertion into a
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def _generate_deletes(term: str, max_distance: int) -> set[str]:
    """All delete variants within max_distance (symspell.go:150-180)."""
    deletes: set[str] = set()

    def rec(t: str, d: int) -> None:
        if d <= 0 or len(t) <= 1:
            return
        for i in range(len(t)):
            del_t = t[:i] + t[i + 1 :]
            if del_t not in deletes:
                deletes.add(del_t)
                rec(del_t, d - 1)

    rec(term, max_distance)
    return deletes


@dataclass
class SymSpell:
    """Symmetric-delete index (symspell.go:10-139)."""

    max_edit_distance: int = 2
    min_term_length: int = 3
    dictionary: dict[str, int] = field(default_factory=dict)
    deletes: dict[str, list[str]] = field(default_factory=dict)

    def add_term(self, term: str, frequency: int) -> None:
        term = term.strip().upper()
        if len(term) < self.min_term_length:
            return
        self.dictionary[term] = frequency
        for d in _generate_deletes(term, self.max_edit_distance):
            self.deletes.setdefault(d, []).append(term)

    def add_terms(self, entries: list[tuple[str, int]]) -> None:
        for term, freq in entries:
            self.add_term(term, freq)

    def contains(self, term: str) -> bool:
        return term.strip().upper() in self.dictionary

    def lookup(self, input_term: str, max_distance: int | None = None) -> list[Suggestion]:
        """Suggestions sorted by (distance asc, frequency desc)
        (symspell.go:67-139)."""
        inp = input_term.strip().upper()
        if not inp:
            return []
        max_d = self.max_edit_distance if max_distance is None else min(max_distance, self.max_edit_distance)

        if inp in self.dictionary:
            return [Suggestion(inp, 0, self.dictionary[inp])]

        seen: set[str] = set()
        candidates: list[Suggestion] = []
        input_deletes = list(_generate_deletes(inp, max_d))
        input_deletes.append(inp)

        for d in input_deletes:
            for term in self.deletes.get(d, ()):
                if term in seen:
                    continue
                seen.add(term)
                dist = damerau_levenshtein(inp, term, max_d)
                if 0 <= dist <= max_d:
                    candidates.append(Suggestion(term, dist, self.dictionary[term]))
            if d in self.dictionary and d not in seen:
                seen.add(d)
                dist = damerau_levenshtein(inp, d, max_d)
                if 0 <= dist <= max_d:
                    candidates.append(Suggestion(d, dist, self.dictionary[d]))

        candidates.sort(key=lambda s: (s.distance, -s.frequency))
        return candidates

    def lookup_best(self, input_term: str, max_distance: int | None = None) -> Suggestion | None:
        out = self.lookup(input_term, max_distance)
        return out[0] if out else None


def build_from_corpus_tokens(token_freqs: dict[str, int], max_edit_distance: int = 2, min_term_length: int = 3, min_frequency: int = 1) -> SymSpell:
    """Build a dictionary from corpus token frequencies (the analogue of
    BuildFromLLPG, internal/symspell/dictionary.go:30-221: gazetteer
    tokens ≥ MinFrequency; the engine seeds it from the corpus' own
    canonical tokens instead of a DB scan)."""
    s = SymSpell(max_edit_distance=max_edit_distance, min_term_length=min_term_length)
    for term, freq in token_freqs.items():
        if freq >= min_frequency:
            s.add_term(term, freq)
    return s


class Corrector:
    """Token-level corrector with skip rules (corrector.go:100-143)."""

    def __init__(self, symspell: SymSpell, max_edit_distance: int = 2, min_term_length: int = 3):
        self.symspell = symspell
        self.max_edit_distance = max_edit_distance
        self.min_term_length = min_term_length

    def correct_token(self, token: str) -> tuple[str, int]:
        """Returns (corrected, distance); distance 0 = unchanged."""
        t = token.strip().upper()
        if len(t) < self.min_term_length:
            return t, 0
        if _HOUSE_NUMBER.match(t):
            return t, 0
        if t in STREET_SUFFIXES:
            return t, 0
        best = self.symspell.lookup_best(t, self.max_edit_distance)
        if best is None or best.distance == 0:
            return t, 0
        return best.term, best.distance

    def correct_address(self, address: str) -> tuple[str, list[tuple[str, str, int]]]:
        """Port of CorrectAddress (corrector.go:73-98)."""
        tokens = address.split()
        corrections: list[tuple[str, str, int]] = []
        out = []
        for tok in tokens:
            corrected, dist = self.correct_token(tok)
            if dist > 0:
                corrections.append((tok, corrected, dist))
                out.append(corrected)
            else:
                out.append(tok)
        if not corrections:
            return address, []
        return " ".join(out), corrections
