from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mirrulations_iceberg_spark.session import get_spark
from mirrulations_iceberg_spark.tables import TABLE_NAMES

#: Tiny scale factor keeps the full-suite oracle sweep fast. This is
#: NOT sufficient as a pre-commit gate for operators with value-boundary
#: sensitivity: sf0.001 can contain zero boundary rows where the
#: driver's sf0.01 has several (m9's half-cent divergence: 0/493 rows
#: at sf0.001 vs 3/5,088 at sf0.01). Before any commit touching an
#: operator or its oracle, ALSO run the driver replica at the driver's
#: scale: ``python scripts/drivercheck.py`` (defaults to sf0.01).
SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    return get_spark(app_name="pytest", shuffle_partitions=8)


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con
