"""t17c at production geometry (VERDICT r14 item #5): the shipped
driver entry runs toy constants (B=4, 3 rounds); this measures the
batched trainer at B>=16 / vocab target >=64 merges over a REPLICATED
corpus, against t17b at equal vocab, plus the DuckDB oracle replay at
the same geometry (the crossover entry).

Protocol: build a factor-N replica of sf0.1 documents (disjoint doc_id
spaces, texts repeating — replication multiplies corpus size but NOT
distinct tokens, so the per-round vocab aggregate is Heaps-bounded and
the measurement isolates exactly what batching buys: driver
round-trips). Warm session, one throwaway run, then one timed run per
variant. Round-trip accounting: t17b pays 2 collects per MERGE + 1,
t17c pays 2 collects per ROUND + 1.

Usage::

    python scripts/t17c_stress.py --factor 20 --merges 64 --batches 4,16
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mirrulations_iceberg_spark.operators import text
from mirrulations_iceberg_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_t17c(spark, sf, batch: int, merges: int) -> dict:
    pool = 4 * batch
    # enough rounds to reach the merge target even if disjointness
    # rejects some candidates; _t17c_train stops at `rounds`, so cap
    # generously and count what was actually learned from the output
    rounds = (merges + batch - 1) // batch + 2
    t0 = time.time()
    out = text._t17c_train(spark, sf, batch, rounds, pool).collect()
    wall = time.time() - t0
    learned = len(out)
    rounds_run = max((r["round"] for r in out), default=0)
    return {
        "variant": f"t17c B={batch}",
        "wall": wall,
        "merges": learned,
        "round_trips": 2 * rounds_run + 1,
        "total_syms": out[-1]["total_syms"] if out else None,
    }


def run_t17b(spark, sf, merges: int) -> dict:
    old = text.T17B_ITERS
    text.T17B_ITERS = merges
    try:
        t0 = time.time()
        out = text.t17b_bpe_train_iters(spark, sf).collect()
        wall = time.time() - t0
    finally:
        text.T17B_ITERS = old
    return {
        "variant": "t17b (B=1)",
        "wall": wall,
        "merges": len(out),
        "round_trips": 2 * len(out) + 1,
        "total_syms": out[-1]["total_syms"] if out else None,
    }


def run_duckdb_oracle(sf, batch: int, merges: int) -> dict:
    import duckdb

    pool = 4 * batch
    rounds = (merges + batch - 1) // batch + 2
    sql = text._t17c_sql(batch, rounds, pool)
    con = duckdb.connect()
    # replicas land as Spark part-file directories
    pat = (
        f"{sf}/documents.parquet/*.parquet"
        if os.path.isdir(f"{sf}/documents.parquet")
        else f"{sf}/documents.parquet"
    )
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pat}')"
    )
    t0 = time.time()
    rows = con.execute(sql).fetchall()
    wall = time.time() - t0
    return {
        "variant": f"duckdb oracle B={batch}",
        "wall": wall,
        "merges": len(rows),
        "round_trips": None,
        "total_syms": rows[-1][7] if rows else None,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=20)
    ap.add_argument("--merges", type=int, default=64)
    ap.add_argument("--batches", default="4,16")
    ap.add_argument("--with-duckdb", action="store_true")
    args = ap.parse_args()

    from scalestress import build_corpus  # same scripts/ dir

    spark = get_spark()
    base = tempfile.mkdtemp(prefix="t17c_stress_")
    try:
        build_corpus(spark, SF_DIR, base, args.factor, ["documents"])
        n_docs = spark.read.parquet(f"{base}/documents.parquet").count()
        print(f"corpus: {n_docs} docs ({args.factor}x {SF_DIR})")
        def report(r):
            print(
                f"{r['variant']:>22}: wall={r['wall']:7.1f}s"
                f" merges={r['merges']:3d}"
                f" round_trips={r['round_trips']}"
                f" total_syms={r['total_syms']}",
                flush=True,
            )

        run_t17c(spark, base, 4, 8)  # warm-up, discarded
        for b in (int(x) for x in args.batches.split(",")):
            report(run_t17c(spark, base, b, args.merges))
        report(run_t17b(spark, base, args.merges))
        if args.with_duckdb:
            report(
                run_duckdb_oracle(
                    base, int(args.batches.split(",")[-1]), args.merges
                )
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
