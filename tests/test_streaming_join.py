"""Stream-stream attribution join: the streamed result must equal the
batch equi+range join over the same fixture, and the physical plan must
carry state-eviction bounds on both sides (watermark + range condition).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mirrulations_iceberg_spark.streaming import attributed_purchases
from mirrulations_iceberg_spark.tables import load_table

from .conftest import SF_DIR


def _batch_twin(spark):
    events = load_table(spark, SF_DIR, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    return (
        purchases.join(
            clicks,
            F.expr(
                "user_id = c_user AND purchase_ts >= click_ts "
                "AND purchase_ts <= click_ts + INTERVAL 30 MINUTES"
            ),
        )
        .select(
            "purchase_id",
            "user_id",
            "purchase_ts",
            "click_id",
            "click_ts",
            (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias(
                "gap_us"
            ),
        )
    )


def test_stream_join_matches_batch(spark, tmp_path):
    out = attributed_purchases(spark, SF_DIR)
    q = (
        out.writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {tuple(r) for r in spark.sql("SELECT * FROM attrib").collect()}
    want = {tuple(r) for r in _batch_twin(spark).collect()}
    assert len(want) > 0
    assert got == want


def test_stream_join_state_is_bounded(spark):
    """Both join sides must have a watermark, and the join condition a
    two-sided time range — the preconditions Spark needs to evict state.
    """
    out = attributed_purchases(spark, SF_DIR)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2
    assert "purchase_ts" in plan and "click_ts" in plan
