"""Watermark semantics made concrete: append-mode windows finalize
exactly once as the watermark passes, late data is dropped, and
streaming dedup holds within the watermark."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mirrulations_iceberg_spark.tables import load_table

from .conftest import SF_DIR


@pytest.fixture()
def chunked_events_dir(spark, tmp_path):
    """Events split chronologically into 3 files (3 microbatches with
    maxFilesPerTrigger=1) so the watermark advances between batches."""
    out = str(tmp_path / "events_chunks")
    events = load_table(spark, SF_DIR, "events")
    p = events.select(
        F.expr("percentile_approx(cast(ts as long), array(0.33, 0.66))").alias("p")
    ).collect()[0].p
    f1 = events.filter(F.col("ts").cast("long") <= p[0])
    f2 = events.filter(
        (F.col("ts").cast("long") > p[0]) & (F.col("ts").cast("long") <= p[1])
    )
    f3 = events.filter(F.col("ts").cast("long") > p[1])
    for f in (f1, f2, f3):
        f.coalesce(1).write.mode("append").parquet(out)
    return out


def _stream(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(events_dir)
    )
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return df


def test_append_mode_emits_finalized_windows_once(spark, chunked_events_dir, tmp_path):
    agg = (
        _stream(spark, chunked_events_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("final_windows")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.sql("SELECT * FROM final_windows").collect()
    assert emitted, "watermark advance across batches must finalize windows"
    # each window appears exactly once (append = finalized once)
    keys = [r.ws for r in emitted]
    assert len(keys) == len(set(keys))
    # every emitted window's count matches the batch ground truth
    batch = {
        r.ws: r.n
        for r in load_table(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
        .collect()
    }
    for r in emitted:
        assert batch[r.ws] == r.n


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """The same file delivered twice (at-least-once upstream) must not
    double events: dropDuplicatesWithinWatermark on the event key."""
    src = str(tmp_path / "dup_src")
    events = load_table(spark, SF_DIR, "events").limit(500)
    events.coalesce(1).write.mode("append").parquet(src)
    events.coalesce(1).write.mode("append").parquet(src)  # duplicate delivery
    n_unique = 500

    stream = _stream(spark, src).withWatermark("ts", "2 hours")
    deduped = stream.dropDuplicatesWithinWatermark(["event_id"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT COUNT(*) AS n FROM dedup_stream").collect()[0].n
    assert got == n_unique
