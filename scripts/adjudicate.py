#!/usr/bin/env python
"""Isolated bench adjudication (the r7 "environment" protocol,
mechanized): run the named queries in a FRESH minimal session — no
200-query registry sweep before them, no accumulated cache/GC state —
warm each once, then record min-of-3 wall-clock into the noop sink.

Compare the printed numbers against the same queries' rows in a full
BENCH_DETAIL_r{N}.json: parity-or-faster isolated ⇒ the sweep number
was session-crowding (position/GC), not a code regression; still-slow
isolated ⇒ a real plan change worth reading.

Usage: python scripts/adjudicate.py q1 [q2 ...]   (sf via
SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mirrulations_iceberg_spark.operators import collect_queries  # noqa: E402
from mirrulations_iceberg_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: adjudicate.py <query> [...]", file=sys.stderr)
        return 2
    queries, _ = collect_queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    spark = get_spark(app_name="adjudicate")
    out: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        # warm once (codegen/compile), then min-of-3 measured runs
        for run in range(4):
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            spark.catalog.clearCache()
            if run == 0:
                print(f"adjudicate.warm {name} {dt}", flush=True)
            else:
                out[name] = min(out.get(name, float("inf")), dt)
                print(f"adjudicate.run {name} {dt}", flush=True)
        spark.sparkContext._jvm.System.gc()
    print(json.dumps({"sf_dir": SF_DIR, "min_of_3": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
