"""ST5/J11 — rule-based address transforms.

Port of the 10 hard-coded regex rules (internal/engine/rule_matcher.go:49-155)
applied before an exact/trigram re-lookup (rule_matcher.go:156-235).  The
table was meant to be DB-driven (address_normalization_rules,
migrations/002_normalized_schema.sql:83-89); here it is a frozen tuple a
map_batches stage broadcasts.

Divergence note (documented, code-is-ground-truth): rule 10's Go
replacement is ``map[...]["$1"]`` — a lookup of the literal key "$1",
which is absent, so the compiled replacement is the EMPTY string and the
rule DELETES single N/S tokens.  We reproduce that observable behavior.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass(frozen=True)
class AddressRule:
    rule_id: int
    name: str
    pattern: str
    replacement: str
    confidence: float


DEFAULT_RULES: tuple[AddressRule, ...] = (
    AddressRule(1, "lucky_lite_farm", r"LUCKY LITE FARM.*", "LUCKYLITE FARM CATHERINGTON LANE HORNDEAN", 0.95),
    AddressRule(2, "lasham_airfield", r"LASHAM AIRFIELD.*", "LASHAM AERODROME LASHAM", 0.90),
    AddressRule(3, "four_marks_spacing", r"FOUR MARKS", "FOURMARKS", 0.85),
    AddressRule(4, "co_op_variations", r"(?:CO-OP|COOP|CO OP)", "COOPERATIVE", 0.80),
    AddressRule(5, "former_site_prefix", r"FORMER SITE OF (.+)", r"\1", 0.75),
    AddressRule(6, "land_at_prefix", r"LAND AT (.+)", r"\1", 0.70),
    AddressRule(7, "rear_of_references", r"REAR OF (\d+[A-Z]?\s+.+)", r"\1A", 0.65),
    AddressRule(8, "adjacent_to", r"ADJ(?:ACENT)? TO (.+)", r"\1", 0.60),
    AddressRule(9, "opposite_references", r"OPP(?:OSITE)? (.+)", r"\1", 0.60),
    # rule 10: Go compiles map[...]["$1"] == "" (missing key) — the rule
    # deletes standalone N/S; reproduced as-is
    AddressRule(10, "north_south_abbreviations", r"\b([NS])\b", "", 0.75),
)

_COMPILED = tuple((r, re.compile(r.pattern)) for r in DEFAULT_RULES)


def apply_rules(text: str) -> tuple[str, int, float]:
    """Apply the first matching rule (rule_matcher.go:163-189 applies
    rules in order, first hit wins per document).

    Returns (transformed, rule_id, confidence); rule_id 0 = no rule hit.
    """
    up = (text or "").upper()
    for rule, rx in _COMPILED:
        if rx.search(up):
            return rx.sub(rule.replacement, up), rule.rule_id, rule.confidence
    return up, 0, 0.0
