"""Query catalog: every implemented operator from SURVEY.md §2 declares at
least one (Spark query, DuckDB oracle SQL) pair here.

The driver runs both sides at sf0.01 and hash-compares (order-insensitive,
column-name-sorted). Engine rule: every computed column is aliased
identically on both sides; order-sensitive floating aggregation is decimal-
stabilized (see ``operators.aggregate``); order-sensitive survivors (top-k,
dedup) always carry a unique tiebreaker.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    notes: str = ""


CATALOG: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, notes: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        CATALOG[name] = QuerySpec(fn=fn, oracle=oracle, notes=notes)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side-effect: registration) and return
    the full catalog."""
    from .queries import (  # noqa: F401
        aggregates,
        events,
        extended,
        extended2,
        extended3,
        joins,
        llm,
        relational,
        scalars,
        windows,
    )

    # Deterministic q-number order: a driver sweep that truncates still
    # covers the flagship and the core-operator prefix first. Parse the
    # number — lexicographic order broke at q100 (sorted between q10 and
    # q11).
    def qnum(name: str) -> tuple[int, str]:
        digits = "".join(c for c in name[1:] if c.isdigit() or c == "_").split("_")[0]
        return (int(digits) if digits.isdigit() else 10**9, name)

    return dict(sorted(CATALOG.items(), key=lambda kv: qnum(kv[0])))
