"""E2 — property-range expansion (gazetteer densification).

Port of internal/llpg/range_expander.go:56-210 (validation :140-181,
generation :184-210) and its SQL twin sql/expand_llpg_ranges.sql: every
``9-11`` / ``9A-9C``-style range in an address expands to one row per
unit, used as a ``flat_map`` over the gazetteer side before blocking.
"""

from __future__ import annotations

import re

import pyarrow as pa

RANGE_PATTERN = re.compile(r"\b(\d+[A-Z]?)\s*-\s*(\d+[A-Z]?)\b")
_NUM = re.compile(r"^(\d+)")
_WS = re.compile(r"\s")


def is_valid_property_range(start: str, end: str) -> bool:
    """range_expander.go:140-181: start<end for numeric ranges (same
    number with two different single letters allowed), span <= 50,
    numbers in 1..9999."""
    m1, m2 = _NUM.match(start), _NUM.match(end)
    if not m1 or not m2:
        return False
    s_int, e_int = int(m1.group(1)), int(m2.group(1))
    s_suf = start[len(m1.group(1)):]
    e_suf = end[len(m2.group(1)):]
    is_letter_range = s_int == e_int and len(s_suf) == 1 and len(e_suf) == 1 and s_suf != e_suf
    if not is_letter_range and s_int >= e_int:
        return False
    if (e_int - s_int) > 50 or s_int < 1 or e_int > 9999:
        return False
    return True


def generate_property_range(start: str, end: str) -> list[str]:
    """range_expander.go:184-210: 9-11 -> [9,10,11]; 9A-9C -> [9A,9B,9C]
    (numeric ranges carry the START suffix through, per the Go code)."""
    m1, m2 = _NUM.match(start), _NUM.match(end)
    s_num, e_num = m1.group(1), m2.group(1)
    s_suf = start[len(s_num):]
    e_suf = end[len(e_num):]
    s_int, e_int = int(s_num), int(e_num)
    if len(s_suf) == 1 and len(e_suf) == 1 and s_num == e_num and s_suf <= e_suf:
        return [s_num + chr(c) for c in range(ord(s_suf), ord(e_suf) + 1)]
    return [f"{i}{s_suf}" for i in range(s_int, e_int + 1)]


def expand_address(full_address: str, canonical: str) -> list[tuple[str, str, str]]:
    """All expansions of one address: [(new_full, new_canonical, unit)].

    Mirrors expandPropertyRanges (:104-137): each valid range match is
    replaced once per generated unit; the canonical side also repairs the
    concatenated form ("10-11" -> "1011") the reference's canonicalizer
    produces.
    """
    out: list[tuple[str, str, str]] = []
    for m in RANGE_PATTERN.finditer(full_address or ""):
        start, end = m.group(1).strip(), m.group(2).strip()
        if not is_valid_property_range(start, end):
            continue
        concatenated = _WS.sub("", m.group(1)) + _WS.sub("", m.group(2))
        for unit in generate_property_range(start, end):
            new_full = full_address.replace(m.group(0), unit, 1)
            new_canon = (canonical or "").replace(m.group(0), unit, 1)
            new_canon = new_canon.replace(concatenated, unit, 1)
            out.append((new_full, new_canon, unit))
    return out


def expand_batch(batch: pa.Table, address_col: str, canonical_col: str, id_col: str) -> pa.Table:
    """flat_map map_batches fn: one input row -> N expanded rows
    (original rows are NOT re-emitted — Option A, range_expander.go:57)."""
    ids, fulls, canons, units = [], [], [], []
    for i, full, canon in zip(
        batch[id_col].to_pylist(), batch[address_col].to_pylist(), batch[canonical_col].to_pylist()
    ):
        for nf, nc, unit in expand_address(full or "", canon or ""):
            ids.append(i)
            fulls.append(nf)
            canons.append(nc)
            units.append(unit)
    return pa.table(
        {
            id_col: pa.array(ids, batch[id_col].type),
            address_col: pa.array(fulls, pa.string()),
            canonical_col: pa.array(canons, pa.string()),
            "unit_number": pa.array(units, pa.string()),
            "expansion_type": pa.array(["range_expansion"] * len(ids), pa.string()),
        }
    )
