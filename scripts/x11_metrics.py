#!/usr/bin/env python
"""Measure x11's per-nprobe RUNTIME cost from Spark's task metrics.

The driver row's cost axes (candidate count, cand_bytes, pool_frac_bp)
are deterministic by construction; the quantities a deployment also
budgets — executor run time and bytes read per operating point — are
run-dependent, so they cannot live in the hash-gated oracle row
(VERDICT r8 item #7). This script measures them for real on the same
query the driver runs:

* builds x11's shared phase (fit + assignment + candidate pool + exact
  baseline) once, under job group ``x11-build``;
* runs each sweep point's 1-row summary as its own action under job
  group ``x11-np{n}``;
* maps job groups → jobs → stages through the Spark UI REST API (the
  public metrics surface; ``/api/v1/applications/<app>/...``) and sums
  ``executorRunTime`` / ``inputBytes`` / shuffle bytes per group.

Prints a markdown table to paste into PLANS.md's x11 row.

Usage: python scripts/x11_metrics.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path) as resp:
        return json.loads(resp.read())


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .appName("x11-metrics")
        .getOrCreate()
    )
    sc = spark.sparkContext
    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"

    from mirrulations_iceberg_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
        X11_NPROBE_SWEEP,
        _x11_build,
        _x11_point_summary,
    )
    from pyspark.sql import functions as F

    sc.setJobGroup("x11-build", "shared fit+assignment+pool")
    emb, pool, exact_topk = _x11_build(spark, sf_dir)
    pool.count()  # materialize the cached pool
    exact_topk.count()  # materialize the cached exact baseline
    sc.setJobGroup("x11-base", "")

    denom = N_QUERIES * TOP_K
    pool_total = pool.agg(F.count(F.lit(1)).alias("__pt"))
    results = {}
    for np_ in X11_NPROBE_SWEEP:
        sc.setJobGroup(f"x11-np{np_}", f"sweep point nprobe={np_}")
        row = _x11_point_summary(
            pool, exact_topk, pool_total, np_, denom
        ).collect()[0]
        results[np_] = row.asDict()
    sc.setJobGroup("x11-done", "")

    # group → stage metrics via the REST API
    jobs = _api(base, "/jobs")
    group_stages: dict[str, set[int]] = {}
    for j in jobs:
        grp = j.get("jobGroup") or ""
        group_stages.setdefault(grp, set()).update(j.get("stageIds", []))
    metrics: dict[str, dict] = {}
    for grp, sids in group_stages.items():
        agg = {"run_ms": 0, "input_bytes": 0, "shuffle_bytes": 0, "tasks": 0}
        for sid in sids:
            try:
                for att in _api(base, f"/stages/{sid}"):
                    agg["run_ms"] += att.get("executorRunTime", 0)
                    agg["input_bytes"] += att.get("inputBytes", 0)
                    agg["shuffle_bytes"] += att.get(
                        "shuffleReadBytes", 0
                    ) + att.get("shuffleWriteBytes", 0)
                    agg["tasks"] += att.get("numCompleteTasks", 0)
            except Exception:
                continue  # skipped/pending stage
        metrics[grp] = agg

    print(f"\n### x11 per-point runtime metrics (sf_dir={sf_dir})\n")
    print(
        "| phase | executorRunTime ms | input MB | shuffle MB | tasks |"
        " n_candidates | recall_bp |"
    )
    print("|---|---|---|---|---|---|---|")
    b = metrics.get("x11-build", {})
    print(
        f"| shared build | {b.get('run_ms', 0)} |"
        f" {b.get('input_bytes', 0) / 1e6:.1f} |"
        f" {b.get('shuffle_bytes', 0) / 1e6:.1f} | {b.get('tasks', 0)} |"
        " — | — |"
    )
    for np_ in X11_NPROBE_SWEEP:
        m = metrics.get(f"x11-np{np_}", {})
        r = results[np_]
        print(
            f"| nprobe={np_} | {m.get('run_ms', 0)} |"
            f" {m.get('input_bytes', 0) / 1e6:.1f} |"
            f" {m.get('shuffle_bytes', 0) / 1e6:.1f} |"
            f" {m.get('tasks', 0)} | {r['n_candidates']} |"
            f" {r['recall_bp']} |"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
