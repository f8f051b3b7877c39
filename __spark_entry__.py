"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real code lives in :mod:`mirrulations_iceberg_spark`; this module is
pure wiring so the harness and human users share one query surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mirrulations_iceberg_spark.operators import collect_queries  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is ``e2_training_pipeline`` — the engine's purpose in
    one query: quality gate → exact dedup → near-dup drop → stratified
    sample → per-language corpus summary, every stage in its 100 TB
    shape (projection gates, group-and-pair near-dup with hot-key caps,
    per-stratum windows) and the whole composition oracle-checked.
    """
    queries, _ = collect_queries()
    return queries["e2_training_pipeline"](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    q, _ = collect_queries()
    return q


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each entry in ``queries()``.

    Keys absent here (non-SQL-expressible ops) get the driver's weaker
    rows-only check.
    """
    _, o = collect_queries()
    return o
