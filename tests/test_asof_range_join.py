"""asof_join (union + running last_value) and interval_bucket_join
(bucketed equi-join) must match their naive formulations exactly.

The naive as-of baseline here is pandas ``merge_asof`` semantics spelled
out as an inequality join + per-left-row argmax — quadratic per key, fine
at test size, unusable at scale. The operators under test are the
single-shuffle reformulations.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mirrulations_iceberg_spark.operators.joins import (
    asof_join,
    interval_bucket_join,
)


def _events(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    # 5 users x 40 interleaved left/right events, adversarial ties at i%7==0.
    for u in range(5):
        for i in range(40):
            ts = base + dt.timedelta(minutes=3 * i + u)
            rows.append((u, ts, "L", 1000 * u + i))
            if i % 3 == 0:
                # right event; at i%7==0 it collides exactly with the left ts
                rts = ts if i % 7 == 0 else ts - dt.timedelta(seconds=17)
                rows.append((u, rts, "R", 5000 + 1000 * u + i))
    df = spark.createDataFrame(rows, "user long, ts timestamp, side string, val long")
    left = df.filter("side = 'L'").select("user", "ts", F.col("val").alias("l_val"))
    right = df.filter("side = 'R'").select(
        "user", F.col("ts").alias("r_ts"), F.col("val").alias("r_val")
    )
    return left, right


def _naive_asof(left, right):
    """Inequality join + argmax — the semantics oracle."""
    j = left.join(right, ["user"], "left").filter(
        F.col("r_ts").isNull() | (F.col("r_ts") <= F.col("ts"))
    )
    best = (
        j.groupBy("user", "ts", "l_val")
        .agg(F.max_by(F.struct("r_ts", "r_val"), "r_ts").alias("m"))
        .select("user", "ts", "l_val", F.col("m.r_ts").alias("r_ts"),
                F.col("m.r_val").alias("r_val"))
    )
    # left rows with no candidate at all fall out of the filter-join; re-add
    missing = left.join(best.select("user", "ts"), ["user", "ts"], "left_anti")
    return best.unionByName(
        missing.select(
            "user", "ts", "l_val",
            F.lit(None).cast("timestamp").alias("r_ts"),
            F.lit(None).cast("long").alias("r_val"),
        )
    )


def test_asof_join_matches_naive(spark):
    left, right = _events(spark)
    got = {
        tuple(r)
        for r in asof_join(
            left, right, on="user", left_ts="ts", right_ts="r_ts",
            payload=["r_ts", "r_val"],
        )
        .select("user", "ts", "l_val", "r_ts", "r_val")
        .collect()
    }
    want = {tuple(r) for r in _naive_asof(left, right).collect()}
    assert got == want
    assert len(got) == 5 * 40  # exactly one output row per left row


def test_asof_join_includes_equal_ts(spark):
    """ASOF >= semantics: a right row at exactly the left ts matches."""
    left, right = _events(spark)
    out = asof_join(
        left, right, on="user", left_ts="ts", right_ts="r_ts",
        payload=["r_ts", "r_val"],
    )
    eq = out.filter(F.col("r_ts") == F.col("ts")).count()
    assert eq > 0


def test_asof_join_single_shuffle(spark):
    """Plan contract: one Exchange total (the window partitioning) —
    no join node, no row amplification."""
    left, right = _events(spark)
    plan = (
        asof_join(left, right, on="user", left_ts="ts", right_ts="r_ts",
                  payload=["r_val"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


def test_interval_bucket_join_matches_nested_loop(spark):
    base = dt.datetime(2024, 3, 1)
    facts = spark.createDataFrame(
        [(i, base + dt.timedelta(hours=i * 7)) for i in range(200)],
        "fact_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (j, base + dt.timedelta(days=3 * j), base + dt.timedelta(days=3 * j, hours=30))
            for j in range(15)
        ],
        "iv_id long, start timestamp, end timestamp",
    )
    naive = {
        tuple(r)
        for r in facts.join(
            intervals,
            (facts.ts >= intervals.start) & (facts.ts < intervals.end),
        )
        .select("fact_id", "iv_id")
        .collect()
    }
    bucketed = {
        tuple(r)
        for r in interval_bucket_join(
            facts, intervals, ts_col="ts", start_col="start", end_col="end"
        )
        .select("fact_id", "iv_id")
        .collect()
    }
    assert bucketed == naive
    assert len(naive) > 0
