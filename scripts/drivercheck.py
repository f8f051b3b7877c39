#!/usr/bin/env python
"""Driver-replica correctness check.

Replays what the round driver does to ``__spark_entry__``: run every
``queries()`` entry at a given scale factor, run the matching
``oracle_sql()`` string in DuckDB over the same parquet files, and
compare row count + order-insensitive value hash (columns sorted by
name, every cell stringified, rows sorted). Exit 0 iff all green.

Usage: python scripts/drivercheck.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from mirrulations_iceberg_spark.session import get_spark  # noqa: E402
from mirrulations_iceberg_spark.tables import TABLE_NAMES  # noqa: E402
from mirrulations_iceberg_spark.testing import value_hash  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    spark = get_spark(shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    n_pass = n_rowsonly = n_fail = n_err = 0
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR  {name}: spark: {type(exc).__name__}: {exc}"[:300])
            n_err += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ROWS   {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR  {name}: duckdb: {type(exc).__name__}: {exc}"[:300])
            n_err += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL   {name}: cols spark={sorted(scols)} oracle={sorted(ocols)}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL   {name}: rows spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        sh, oh = value_hash(scols, srows), value_hash(ocols, orows)
        if sh != oh:
            print(f"FAIL   {name}: value hash mismatch ({len(srows)} rows)")
            n_fail += 1
        else:
            print(f"PASS   {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(
        f"== {n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail, {n_err} error "
        f"(sf_dir={sf_dir})"
    )
    return 0 if (n_fail == 0 and n_err == 0) else 1


if __name__ == "__main__":
    raise SystemExit(main())
