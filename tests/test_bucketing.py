"""Bucketed-table shuffle elimination — the t4 token-index promise,
demonstrated: materialize (token, doc_id) postings bucketed by token,
then a token-keyed self-join plans NO Exchange (bucketed scan feeds the
join directly). At 100 TB this is the difference between a full-corpus
shuffle per lookup-join and none."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mirrulations_iceberg_spark.operators.text import build_token_index
from mirrulations_iceberg_spark.tables import load_table

from .conftest import SF_DIR

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_postings(spark, tmp_path_factory):
    # warehouse.dir is a static conf — the table lands in the session's
    # default warehouse; DROP TABLE below also removes the files.
    docs = load_table(spark, SF_DIR, "documents")
    postings = build_token_index(docs)
    name = "postings_bucketed"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        postings.write.bucketBy(N_BUCKETS, "token")
        .sortBy("token")
        .format("parquet")
        .mode("overwrite")
        .saveAsTable(name)
    )
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_postings):
    t = spark.table(bucketed_postings)
    # hint("merge"): at this SF Spark would broadcast (also shuffle-free
    # but trivially so); force the sort-merge path a 100 TB fact-fact
    # join takes — bucketing must eliminate its exchanges.
    a = t.alias("a").hint("merge")
    b = t.alias("b")
    joined = a.join(b, "token").filter(F.col("a.doc_id") < F.col("b.doc_id"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "Bucketed: true" in plan
    assert joined.count() > 0


def test_bucketed_aggregation_has_no_shuffle(spark, bucketed_postings):
    t = spark.table(bucketed_postings)
    agg = t.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    # sanity: same result as the unbucketed aggregation
    docs = load_table(spark, SF_DIR, "documents")
    expected = (
        build_token_index(docs).groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    )
    got = {(r.token, r.df) for r in agg.collect()}
    want = {(r.token, r.df) for r in expected.collect()}
    assert got == want


def test_j10_join_plan_has_no_exchange(spark):
    """The j10 driver query's payoff, asserted: both bucketed scans
    feed the SortMergeJoin with no Exchange in between."""
    from mirrulations_iceberg_spark.operators.joins import J10_BUCKETS
    from mirrulations_iceberg_spark.tables import load_table as lt

    to, tl = "j10_plan_orders", "j10_plan_lineitem"
    spark.sql(f"DROP TABLE IF EXISTS {to}")
    spark.sql(f"DROP TABLE IF EXISTS {tl}")
    try:
        (
            lt(spark, SF_DIR, "orders")
            .select("o_orderkey", "o_orderstatus")
            .write.bucketBy(J10_BUCKETS, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable(to)
        )
        (
            lt(spark, SF_DIR, "lineitem")
            .select("l_orderkey", "l_extendedprice")
            .write.bucketBy(J10_BUCKETS, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable(tl)
        )
        # At fixture scale AQE broadcasts the small side (also fine);
        # force the SortMergeJoin regime the operator is designed for
        # at 100 TB, where NEITHER fact side is broadcastable.
        prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table(tl).join(
                spark.table(to), F.col("l_orderkey") == F.col("o_orderkey")
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange hashpartitioning" not in plan
            assert "Bucketed: true" in plan
            assert joined.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {to}")
        spark.sql(f"DROP TABLE IF EXISTS {tl}")
