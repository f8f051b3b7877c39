"""Scale-stress harness: replicate sf0.1 tables with disjoint id
spaces and time queries on the blown-up corpus.

The 20x/100x protocol PLANS.md documents, made reproducible: each
replica offsets the table's id columns by ``replica * span`` so joins
and dedup see genuinely distinct keys (except the text/embedding
payloads, which repeat — deliberately the adversarial regime for
near-dup operators). Timings are warm min-of-2 on the same session,
mirroring bench.py's action (noop-format write).

Usage::

    python scripts/scalestress.py --factor 100 \
        d13_semdedup a15_exact_quantile_twopass j9_bloom_pruned_join

Prints one line per query: name, 1x seconds, Nx seconds, ratio.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from mirrulations_iceberg_spark.operators import collect_queries
from mirrulations_iceberg_spark.session import get_spark

#: id columns to offset per replica, per table. Offsetting the JOIN
#: keys keeps referential integrity inside each replica (lineitem's
#: l_orderkey moves in lockstep with orders' o_orderkey). Foreign keys
#: into tables that stay 1x are NOT offset — o_custkey, l_partkey,
#: l_suppkey keep pointing at the unreplicated dimension rows, exactly
#: as a real 100x fact growth would (offsetting o_custkey while
#: customer stays symlinked would dangle every replica>=1 row and
#: silently empty customer-join output).
ID_COLS = {
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
    "events": ("event_id", "user_id"),
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey",),
    "customer": ("c_custkey",),
    "part": ("p_partkey",),
    "supplier": ("s_suppkey",),
}

#: tables each query reads — only these get replicated; the rest are
#: symlinked from the source dir (dimension tables stay 1x, as they
#: would at 100 TB).
ALL_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def build_corpus(
    spark: SparkSession,
    src: str,
    dst: str,
    factor: int,
    tables: list[str],
    novel: bool = False,
) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in ALL_TABLES:
        src_path = os.path.join(src, f"{t}.parquet")
        dst_path = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(src_path) or os.path.exists(dst_path):
            continue
        if t not in tables:
            os.symlink(src_path, dst_path)
            continue
        base = spark.read.parquet(src_path)
        id_cols = ID_COLS.get(t, ())
        spans = {
            c: (base.agg(F.max(c)).collect()[0][0] or 0) + 1 for c in id_cols
        }
        replicas = []
        for r in range(factor):
            df = base
            for c, span in spans.items():
                df = df.withColumn(c, F.col(c) + F.lit(r * span))
            if novel and t == "documents":
                # --novel: the adversarial regime for dedup-shaped
                # pipelines (VERDICT r8 item #6) — append one globally
                # unique token per row so NO text repeats anywhere:
                # exact dedup collapses nothing, every delta doc is
                # novel, and the anti-join + decontamination carry
                # full weight instead of the replication-favorable
                # early collapse.
                df = df.withColumn(
                    "text",
                    F.concat_ws(
                        " ",
                        F.col("text"),
                        F.concat(F.lit("uniqtok"), F.col("doc_id")),
                    ),
                )
            replicas.append(df)
        out = replicas[0]
        for df in replicas[1:]:
            out = out.unionByName(df)
        # 32 files => row-group-parallel scans on local[32]
        out.repartition(32).write.mode("overwrite").parquet(dst_path)
        print(f"replicated {t}: {base.count()} -> x{factor}", flush=True)


def time_query(spark: SparkSession, fn, sf_dir: str, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        spark.catalog.clearCache()
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--novel",
        action="store_true",
        help="make every replicated documents row textually unique "
        "(worst case for dedup/novelty pipelines)",
    )
    ap.add_argument(
        "--tables",
        help="comma-separated tables to replicate (default: inferred "
        "fact tables documents,embeddings,events,orders,lineitem)",
        default="documents,embeddings,events,orders,lineitem",
    )
    args = ap.parse_args()
    queries, _ = collect_queries()
    for q in args.queries:
        if q not in queries:
            print(f"unknown query: {q}", file=sys.stderr)
            return 2
    if args.novel and "documents" not in args.tables.split(","):
        print(
            "--novel only mutates the documents table; add it to "
            "--tables or the 'adversarial' run silently measures the "
            "duplicate regime",
            file=sys.stderr,
        )
        return 2
    spark = get_spark(app_name="scalestress")
    dst = tempfile.mkdtemp(prefix=f"miis_stress_{args.factor}x_")
    try:
        build_corpus(
            spark, args.src, dst, args.factor, args.tables.split(","), novel=args.novel
        )
        for q in args.queries:
            fn = queries[q]
            t1 = time_query(spark, fn, args.src)
            tn = time_query(spark, fn, dst)
            print(
                f"{q}: 1x={t1:.2f}s {args.factor}x={tn:.2f}s "
                f"ratio={tn / max(t1, 1e-9):.1f}x",
                flush=True,
            )
    finally:
        shutil.rmtree(dst, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
