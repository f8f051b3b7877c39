"""Cache-lifecycle helper for operators that persist an intermediate.

A query function that ``cache()``/``persist()``-es an intermediate must
not leak the cached blocks past its own return: a long-lived session
composing many operators would otherwise accumulate orphaned executor
storage (bench's per-query ``clearCache()`` hides the leak there, a
shared session does not). For operators whose *result* is
dimension-bounded — top-k rows, per-language summaries, decile tables,
never corpus-sized — the fix is free: materialize the bounded result,
release the caches, and hand back a driver-local DataFrame with the
identical schema. The collect is the same one the caller was about to
do anyway.

Operators whose output scales with the corpus (pair enumerations d3/x4)
keep their caches attached to the returned lazy plan instead: there the
cache serves multiple *references inside one action*, and releasing it
before the caller's action would re-run the lineage per reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def materialize_release(
    spark: SparkSession, result: DataFrame, *cached: DataFrame
) -> DataFrame:
    """Collect a dimension-bounded ``result``, unpersist every
    DataFrame in ``cached``, and return the rows as a driver-local
    DataFrame carrying ``result``'s exact schema."""
    rows = result.collect()
    for df in cached:
        df.unpersist(blocking=False)
    return spark.createDataFrame(rows, result.schema)


def spark_round_decimal(x: float, places: int):
    """The exact Decimal Spark's ``round(double, n)`` lands on:
    ``BigDecimal.valueOf`` (shortest-decimal ``Double.toString``) then
    ``setScale(n, HALF_UP)``. Python's ``repr`` is the same
    shortest-roundtrip decimal, so quantizing it HALF_UP matches
    bit-for-bit. (Builtin ``round`` is banker's rounding on the binary
    value — NOT equivalent.) Shared by the x10 driver-side greedy and
    the workload oracle literals so the parity trick has one home.
    """
    import decimal

    return decimal.Decimal(repr(x)).quantize(
        decimal.Decimal(1).scaleb(-places), rounding=decimal.ROUND_HALF_UP
    )
