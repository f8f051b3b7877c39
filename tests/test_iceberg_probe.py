"""Iceberg runtime probe: honest dual-mode routing for m3/m9.

In this container the probe must return False (no
iceberg-spark-runtime jar ships — SURVEY §6) and both operators must
take the parquet fallback; on a deployment with the jar the same
queries route through writeTo().append()/overwritePartitions() and the
``iceberg`` marker test exercises that branch for real. Either way the
output rows are identical, so the DuckDB oracles cover both modes."""

from __future__ import annotations

import pytest

from mirrulations_iceberg_spark.operators.iceberg import (
    CATALOG_PREFIX,
    ensure_catalog,
    iceberg_available,
)
from mirrulations_iceberg_spark.operators.maintenance import (
    m3_delta_append,
    m9_partition_overwrite,
)

from .conftest import SF_DIR


def test_probe_is_cached_and_boolean(spark):
    first = iceberg_available(spark)
    assert isinstance(first, bool)
    assert iceberg_available(spark) is first


def test_fallback_mode_still_green(spark):
    """Whatever the probe says, m3/m9 run and produce their contract
    rows — in this container that exercises the parquet fallback."""
    rows = {r["part"]: r["n_rows"] for r in m3_delta_append(spark, SF_DIR).collect()}
    assert rows["union_read"] == sum(v for k, v in rows.items() if k != "union_read")
    statuses = {r["o_orderstatus"] for r in m9_partition_overwrite(spark, SF_DIR).collect()}
    assert statuses == {"O", "F", "P"}


def test_real_iceberg_branch(spark, tmp_path):
    """Runs only where the jar exists; here it documents the gap."""
    if not iceberg_available(spark):
        pytest.skip("no iceberg-spark-runtime jar in this container")
    cat = ensure_catalog(spark, str(tmp_path))
    assert cat.startswith(CATALOG_PREFIX)
    # a different warehouse must get a different catalog name (the
    # plugin-cache trap: conf changes on an existing name are ignored)
    assert ensure_catalog(spark, str(tmp_path / "other")) != cat
    spark.range(3).writeTo(f"{cat}.db.probe").using("iceberg").createOrReplace()
    assert spark.table(f"{cat}.db.probe").count() == 3


def test_catalog_name_is_per_warehouse(spark, tmp_path):
    """Needs no jar: ensure_catalog only sets session conf. Distinct
    warehouses must yield distinct catalog names (CatalogManager
    caches plugins by name, ignoring later conf changes)."""
    a = ensure_catalog(spark, str(tmp_path / "a"))
    b = ensure_catalog(spark, str(tmp_path / "b"))
    assert a != b
    assert a == ensure_catalog(spark, str(tmp_path / "a"))  # stable
