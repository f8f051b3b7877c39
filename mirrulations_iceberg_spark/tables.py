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


def ensure_nanos_conf(spark: SparkSession) -> None:
    """events.parquet carries TIMESTAMP(NANOS); a session without this
    conf fails footer-schema conversion (PARQUET_TYPE_ILLEGAL). It is a
    runtime-settable SQL conf, so every reader that touches the file —
    batch or streaming schema inference — calls this first rather than
    relying on session.py defaults: callers may hand us any
    SparkSession (the round driver builds a plain one) and each query
    must be self-sufficient even when it runs first in the session."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table.

    Plain ``spark.read.parquet`` keeps the scan declarative: Catalyst
    pushes filters / prunes columns into the vectorized Parquet reader,
    so callers never pre-materialize.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        ensure_nanos_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanosAsLong=true (session.py) surfaces the fixture's
        # TIMESTAMP(NANOS) column as epoch-nanos. Convert via integer
        # division (DIV, not /) so no precision is lost to a double;
        # truncation to micros is Spark's maximum timestamp precision.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for ``spark.sql`` queries."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
