"""t17b iteration-count scaling (VERDICT r11 item #6): N=6 proves the
mechanism; production tokenizers run thousands of merges, and each
round costs two driver round-trips (the argmax ``limit(1).collect()``
and the symbol-total collect). This measures where the per-round cost
bends as the vocabulary shrinks and the per-round work is dominated by
job-scheduling latency rather than data.

Protocol: same session, warm (one throwaway N=2 run first), then one
timed whole run per N; the steady-state per-round floor is the
successive-difference marginal (Δwall/Δrounds-completed) between
consecutive N values, printed on each line after the first. The
marginal is suppressed when a run exhausts the vocabulary early
(rounds < N): the exhausted run pays one extra empty-argmax probe the
completed run never ran, which would inflate the marginal.

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


def run_at(spark, n: int) -> tuple[float, int]:
    """Run t17b at T17B_ITERS=n; return (total_sec, rounds_completed).

    rounds_completed (the output row count) can be < n when the
    vocabulary fully merges early — marginal costs divide by the
    ROUNDS ACTUALLY RUN, not the requested n. total(N) is additive in
    rounds, so successive differences between runs ARE the per-round
    costs."""
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
    prev_rounds, prev_wall = None, None
    for n in [int(x) for x in args.iters.split(",")]:
        wall, n_rounds = run_at(spark, n)
        line = f"t17b N={n} rounds={n_rounds} wall={wall:.2f}s"
        if n_rounds < n:
            line += " (vocab exhausted early; marginal suppressed)"
        elif prev_rounds is not None and n_rounds > prev_rounds:
            per_round = (wall - prev_wall) / (n_rounds - prev_rounds)
            line += f" marginal_per_round={per_round:.3f}s"
        print(line, flush=True)
        prev_rounds, prev_wall = n_rounds, wall
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
