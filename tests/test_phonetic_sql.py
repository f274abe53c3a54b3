"""metaphone_sql (the generated DuckDB twin of functions.phonetics.
metaphone) must agree with the Python codec on every charset shape the
canonical text can produce."""

from __future__ import annotations

import duckdb
import pandas as pd

from ehdc_llpg_address_matching_ray.functions.phonetics import metaphone
from ehdc_llpg_address_matching_ray.pipelines.queries import metaphone_sql

CASES = [
    "",
    "A",
    "STREET",
    "PHONE",  # PH -> F
    "GHOST",  # GH -> F
    "CHURCH",  # CH -> X twice + dedupe
    "KNIGHT",  # KN -> N, GH -> F
    "WRIGHT",
    "THEATRE",  # TH -> 0 (theta)
    "QUEEN",  # QU -> KW
    "QUH",  # replacement-order interaction documented in the port
    "WHARF",
    "BLACKSMITH",
    "MISSISSIPPI",  # consecutive duplicate collapse
    "AAAA",
    "BOOKKEEPER",
    "12",  # digits (callers pass digits through, but codec must not crash)
    "12A",
    "1144A",  # digit runs collapse like any other char
    "A1A1A1",
    "X",
    "YYY",  # Y is a vowel for the strip but the first char survives
]


def test_metaphone_sql_matches_python():
    df = pd.DataFrame({"t": CASES})
    con = duckdb.connect()
    con.register("toks", df)
    got = con.execute(f"SELECT t, {metaphone_sql('t')} AS code FROM toks").df()
    con.close()
    for t, code in zip(got["t"], got["code"]):
        assert code == metaphone(t), f"{t!r}: sql={code!r} py={metaphone(t)!r}"
