"""Driver-visible Structured Streaming queries (SURVEY §2.10).

The streaming package (`mirrulations_iceberg_spark.streaming`) holds
the production shapes — incremental ingest with quarantine, watermarked
append-mode windows, applyInPandasWithState sessions, stream-stream
joins — each pytest-verified. This module surfaces streaming on the
driver's correctness gate too: run a REAL streaming job over the
fixture (file source → stateful aggregation → memory sink,
`availableNow` trigger) and hand the finished result table to the
oracle compare. The claim being checked is stream/batch parity: the
same logical aggregation, executed incrementally over micro-batches
with state, must produce exactly the batch answer — Spark's
"Dataset-parity" contract, checked here against DuckDB rather than
assumed.

Reference parity: the reference's incremental conversion loop
(``convert_to_iceberg.py:956-1121``) reprocesses dockets sequentially;
the streaming twin is `streaming/incremental.py`. This module's
queries are the measurable tip of that surface.

Complete-output mode is used deliberately: it emits every window at
stream end, which is what a one-shot parity check needs. Production
(unbounded) runs use append mode + the watermark so state stays
bounded — that path, including finalize-once and late-drop semantics,
is covered in ``tests/test_streaming_semantics.py``.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events fixture as a file-source stream, with the same
    TIMESTAMP(NANOS) → timestamp conversion as ``tables.load_table``
    so stream and batch arithmetic agree."""
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    return (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    )


def _run_to_table(agg: DataFrame, prefix: str) -> DataFrame:
    """Execute a streaming aggregation to completion (availableNow)
    into a uniquely-named memory sink and return the result table."""
    name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return agg.sparkSession.table(name)


def s1_stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows, computed BY THE STREAMING
    ENGINE (file source → watermarked stateful agg → memory sink) and
    oracle-checked against the batch GROUP BY — stream/batch parity as
    a driver-visible correctness row, not a pytest-only claim.

    Decimal-stabilized sum keeps the check exact across micro-batch
    accumulation order (the same convention as the batch queries).
    """
    events = _events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_epoch"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    return _run_to_table(agg, "s1_sink")


QUERIES = {
    "s1_stream_windowed_counts": s1_stream_windowed_counts,
}

ORACLE = {
    "s1_stream_windowed_counts": """
        -- epoch_ns, not epoch(): epoch() returns DOUBLE seconds, which
        -- cannot hold nanosecond timestamps exactly and rounds
        -- boundary-adjacent events into the next hour.
        SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS window_epoch,
               event_type, COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2
    """,
}
