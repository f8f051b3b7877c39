"""Loading and registering the synthetic star-schema test tables.

Mirrors the reference's in-memory table registration
(``simple_iceberg_exploration.py:314-318`` — ``con.register('comments',
df)``) with ``createOrReplaceTempView``; at production scale these are
Iceberg/Parquet tables and the reader below is the only place that
changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ensure_events_read_conf(spark: SparkSession) -> None:
    """Session confs required to read ``events.parquet`` across fixture
    generations — NOTE: mutates two session-wide confs (ADVICE r5: the
    name now says "events read conf", not "nanos", because the TZ pin
    below is not nanos-specific).

    * ``nanosAsLong``: early testdata generations wrote events.ts as
      TIMESTAMP(NANOS), which a session without this conf fails to read
      (footer-schema conversion, PARQUET_TYPE_ILLEGAL). Current
      generations write plain micros, where the conf is a no-op — kept
      (runtime-settable, harmless) so the readers survive either
      generation.
    * ``session.timeZone = UTC``: pins the NTZ→LTZ cast in
      ``normalize_event_ts`` and epoch rendering host-TZ-independent.
      This changes timestamp/cast semantics for the WHOLE session, not
      just events reads, and is deliberately NOT restored afterwards
      (ADVICE r6): the DataFrame we return is lazy — the conf is read
      at *execution* time, so a restore-after-read contextmanager would
      silently undo the pin before the caller's action runs. Sessions
      built by :func:`session.get_spark` already set UTC at creation
      (``_SCALE_SAFE_CONF``), making this a no-op there; a caller
      handing us a foreign session they also use for non-UTC timestamp
      work must re-set the conf after their events actions complete.

    Every reader that touches the file — batch or streaming schema
    inference — calls this first rather than relying on session.py
    defaults: callers may hand us any SparkSession (the round driver
    builds a plain one) and each query must be self-sufficient even
    when it runs first in the session."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Pin the session timezone so the NTZ→LTZ cast in
    # normalize_event_ts and epoch rendering are host-TZ-independent
    # (identity on this UTC container; determinism elsewhere).
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Bring ``events.ts`` to plain TimestampType regardless of how the
    fixture generation encoded it:

    * ``bigint`` — TIMESTAMP(NANOS) surfaced as epoch-nanos by
      ``nanosAsLong``: integer-divide to micros (DIV, not ``/`` — no
      precision detour through double) and reinterpret as a UTC epoch.
    * ``timestamp_ntz`` — plain micros with ``isAdjustedToUTC=false``:
      cast to TimestampType (identity under the UTC session timezone
      every entry point pins) so downstream window/watermark/epoch
      arithmetic sees one type across generations.
    * ``timestamp`` — already the target type.

    Works on batch and streaming DataFrames alike (pure projection).
    """
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        return df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    if dt == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table.

    Plain ``spark.read.parquet`` keeps the scan declarative: Catalyst
    pushes filters / prunes columns into the vectorized Parquet reader,
    so callers never pre-materialize.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        ensure_events_read_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_event_ts(df)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for ``spark.sql`` queries."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
