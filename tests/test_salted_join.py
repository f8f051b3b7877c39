"""salted_join must be result-identical to the plain join, while
splitting a hot key across salt partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from mirrulations_iceberg_spark.operators.joins import salted_join


def _skewed_frames(spark):
    # 10k rows on one hot key + a tail of normal keys.
    hot = spark.range(10_000).select(
        F.lit(1).alias("k"), F.col("id").alias("payload")
    )
    tail = spark.range(100).select(
        (F.col("id") + 2).alias("k"), (F.col("id") * 10).alias("payload")
    )
    skewed = hot.unionByName(tail)
    dim = spark.range(120).select(
        (F.col("id") + 1).alias("k"), F.concat(F.lit("v"), F.col("id")).alias("name")
    )
    return skewed, dim


def test_salted_join_matches_plain_inner(spark):
    skewed, dim = _skewed_frames(spark)
    plain = {tuple(r) for r in skewed.join(dim, "k").collect()}
    salted = {tuple(r) for r in salted_join(skewed, dim, "k").collect()}
    assert salted == plain
    assert len(salted) == 10_000 + 100  # hot-key matches + full tail overlap


def test_salt_spreads_hot_key(spark):
    skewed, _ = _skewed_frames(spark)
    n = (
        skewed.filter(F.col("k") == 1)
        .select(F.pmod(F.xxhash64("k", "payload"), F.lit(16)).alias("s"))
        .select(F.countDistinct("s").alias("n"))
        .collect()[0]
        .n
    )
    assert n == 16  # the hot key occupies every salt bucket
