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

Scope note: m3/m9 are the two ops routed because their outputs are
ROW semantics (counts, sums) — identical under either storage layer,
so one oracle covers both modes. m4 (compaction) and m12 (vacuum)
deliberately stay on the parquet path even with a jar present: their
outputs include FILE counts, and Iceberg's ``rewrite_data_files`` /
``remove_orphan_files`` procedures make their own layout decisions —
routing them would make the result depend on which mode ran, breaking
the single-oracle contract. Their behavioral content (rewrite
preserves rows; vacuum removes exactly disk−manifest) is checked on
the stand-in.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: Catalog name prefix for probe-routed tables; short-lived per operator.
CATALOG_PREFIX = "miis_ib"

_PROBE_CACHE: dict[str, bool] = {}


def iceberg_available(spark: SparkSession) -> bool:
    """True iff Spark's session classloader can load Iceberg's catalog.

    The lookup goes through ``org.apache.spark.util.Utils.classForName``
    (Spark's own resolver, which consults the session/ivy classloader)
    rather than a bare ``Class.forName`` — jars added via
    ``spark.jars.packages`` live in Spark's MutableURLClassLoader and
    are invisible to the app classloader that loaded py4j, so a bare
    forName false-negatives on exactly the standard deployment path.
    Cached per-JVM: the classpath cannot change after session start.
    """
    # applicationId is stable for a session's lifetime and never reused
    # by a successor session in-process, unlike id() of the Py4J
    # wrapper, which CPython can recycle after GC (ADVICE r8).
    key = spark.sparkContext.applicationId
    if key not in _PROBE_CACHE:
        ok = False
        for attempt in (
            lambda: spark._jvm.org.apache.spark.util.Utils.classForName(
                "org.apache.iceberg.spark.SparkCatalog", True, False
            ),
            lambda: spark._jvm.java.lang.Thread.currentThread()
            .getContextClassLoader()
            .loadClass("org.apache.iceberg.spark.SparkCatalog"),
        ):
            try:
                attempt()
                ok = True
                break
            except Exception:
                continue
        _PROBE_CACHE[key] = ok
    return _PROBE_CACHE[key]


def ensure_catalog(spark: SparkSession, warehouse: str) -> str:
    """Register a Hadoop-type Iceberg catalog over ``warehouse`` and
    return its name. Caller guarantees :func:`iceberg_available`.

    The catalog NAME embeds a hash of the warehouse path: Spark's
    CatalogManager caches each catalog plugin on first reference, so
    re-pointing an existing name's ``.warehouse`` conf is silently
    ignored — a second operator in the same session would write into
    the first operator's (possibly deleted) tmpdir. A fresh name per
    warehouse gets a fresh plugin instance instead.
    """
    import hashlib

    name = f"{CATALOG_PREFIX}_{hashlib.md5(warehouse.encode()).hexdigest()[:8]}"
    spark.conf.set(
        f"spark.sql.catalog.{name}",
        "org.apache.iceberg.spark.SparkCatalog",
    )
    spark.conf.set(f"spark.sql.catalog.{name}.type", "hadoop")
    spark.conf.set(f"spark.sql.catalog.{name}.warehouse", warehouse)
    return name
