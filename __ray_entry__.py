"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in the library.  Importing
the package selects Ray Data's hash-shuffle strategy (required by the
engine's keyed-repartition group processing, see
ehdc_llpg_address_matching_ray/rayutil.py).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from ehdc_llpg_address_matching_ray.pipelines import queries as Q


def entry() -> Any:
    """Flagship linkage pipeline (normalize → symspell-correct → block →
    score → decide → cluster → fact) over the sf0.001 documents table
    shaped as Common-Crawl-style pages; returns the fact Dataset."""
    return Q.q_linkage_fact("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2
    plus the training-data extensions (dedup family, ANN, text stats)."""
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles for every SQL-expressible query (generated from
    the same rule tables as the Ray code where regex chains are
    involved, so the two cannot drift)."""
    return dict(Q.ORACLE_SQL)
