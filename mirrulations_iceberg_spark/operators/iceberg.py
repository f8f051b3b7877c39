"""Iceberg runtime probe + catalog bootstrap (S12 carry item).

This container ships no Iceberg Spark runtime jar (SURVEY §6), so the
maintenance suite stands the table format in with parquet while
exercising the BEHAVIOR (append/time-travel/overwrite/vacuum) for
real. The probe below makes that substitution honest at runtime
instead of assumed at import time: when a deployment DOES ship
``iceberg-spark-runtime`` (the reference's own setup —
``iceberg_exploration.py:65-80`` configures exactly this catalog),
`m3`/`m9` route through the real ``writeTo().append()`` /
``overwritePartitions()`` APIs against a Hadoop-type catalog, and the
parquet path remains the fallback. Both branches produce the same
rows, so one oracle covers both modes.

The catalog is registered lazily via ``spark.conf`` — Spark resolves
``spark.sql.catalog.<name>`` on first reference, so no session restart
is needed.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: Catalog name used for probe-routed tables; short-lived per operator.
CATALOG = "miis_ib"

_PROBE_CACHE: dict[int, bool] = {}


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the JVM can load Iceberg's Spark catalog class.

    Cached per-JVM: the classpath cannot change after session start.
    """
    key = id(spark.sparkContext._jsc)
    if key not in _PROBE_CACHE:
        try:
            spark._jvm.java.lang.Class.forName(
                "org.apache.iceberg.spark.SparkCatalog"
            )
            _PROBE_CACHE[key] = True
        except Exception:
            _PROBE_CACHE[key] = False
    return _PROBE_CACHE[key]


def ensure_catalog(spark: SparkSession, warehouse: str) -> str:
    """Register a Hadoop-type Iceberg catalog over ``warehouse`` and
    return its name. Caller guarantees :func:`iceberg_available`."""
    spark.conf.set(
        f"spark.sql.catalog.{CATALOG}",
        "org.apache.iceberg.spark.SparkCatalog",
    )
    spark.conf.set(f"spark.sql.catalog.{CATALOG}.type", "hadoop")
    spark.conf.set(f"spark.sql.catalog.{CATALOG}.warehouse", warehouse)
    return CATALOG
