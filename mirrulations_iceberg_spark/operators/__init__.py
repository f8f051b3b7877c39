"""Named query/operator surface.

Each submodule exposes two module-level dicts:

* ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]`` —
  DataFrame implementations, one per operator row in ``SURVEY.md §2``.
* ``ORACLE: dict[str, str]`` — equivalent ANSI SQL for DuckDB
  differential checking (absent for non-SQL-expressible operators).

Conventions that keep the DuckDB differential check meaningful:

* every computed column is aliased identically on both sides;
* every ``LIMIT`` is preceded by a total order (explicit tie-breakers) so
  both engines select the same rows;
* floating-point **sums** go through ``DECIMAL(18,2)`` (exact,
  order-independent) and are cast back to double; floating-point
  **means/ratios** are ``ROUND``-ed (division by n makes the error
  negligible); min/max/median/count are exact and left untouched.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def collect_queries() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """Merge QUERIES/ORACLE from every operator module."""
    from . import (
        dedup,
        etl,
        joins,
        maintenance,
        multimodal,
        relational,
        similarity,
        streamq,
        text,
        windows,
    )

    queries: dict[str, QueryFn] = {}
    oracle: dict[str, str] = {}
    for mod in (
        relational,
        joins,
        windows,
        text,
        dedup,
        similarity,
        maintenance,
        etl,
        multimodal,
        streamq,
    ):
        q = getattr(mod, "QUERIES", {})
        o = getattr(mod, "ORACLE", {})
        dup = set(q) & set(queries)
        if dup:
            raise ValueError(f"duplicate query names: {dup}")
        queries.update(q)
        oracle.update(o)
    return queries, oracle
