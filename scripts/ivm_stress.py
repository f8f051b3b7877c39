#!/usr/bin/env python
"""IVM scale-stress for the e16/e17 refresh path (VERDICT r13 #5).

e16's driver query bundles refresh + full recompute + self-grade in
one plan, so `scalestress.py` on the whole query can't show the claim
that matters at 100 TB: the REFRESH touches O(state + delta) rows and
never re-scans the corpus. This harness isolates the two paths:

1. build an N× documents corpus (scalestress's replicate-with-offset
   machinery; ``--novel`` appends a unique token per row so distinct
   content — and therefore the aux state — grows with the corpus,
   the adversarial regime for an fp-keyed state);
2. persist the deployment artifacts ONCE per scale: the auxiliary
   state ``(source, lang, fp) → (cnt, toks)`` and the per-doc delta
   projection (adds = replica-0 docs with doc_id%5==4, deletes =
   replica-0 docs with %5!=4 and %7==3 — the SAME absolute delta at
   every scale, which is the experiment's point);
3. time (warm, min-of-2):
   - refresh: read state parquet + delta parquet, apply the signed
     merge (groups reaching 0 vanish), roll up the card — no corpus
     file is opened, no text is tokenized;
   - full recompute: scan the corpus, tokenize, fingerprint, card.

Usage::

    python scripts/ivm_stress.py --factor 100 [--novel]

Prints one row per scale: state rows, refresh s, full-recompute s.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mirrulations_iceberg_spark.operators.dedup import parallelize_scan
from mirrulations_iceberg_spark.operators.etl import _content_fp
from mirrulations_iceberg_spark.operators.text import tokens_col
from mirrulations_iceberg_spark.session import get_spark


def projection(spark, docs_path: str):
    docs = parallelize_scan(spark.read.parquet(docs_path))
    toks = tokens_col(F.col("text"))
    return docs.withColumn("__toks", toks).select(
        "doc_id",
        "source",
        "lang",
        F.size("__toks").alias("n_toks"),
        _content_fp(F.col("__toks")).alias("fp"),
    )


def timed(fn, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--novel", action="store_true")
    args = ap.parse_args()

    spark = get_spark(app_name="ivm_stress")
    src_docs = os.path.join(args.src, "documents.parquet")
    base_df = spark.read.parquet(src_docs)
    span = int(base_df.agg(F.max("doc_id")).collect()[0][0]) + 1

    work = tempfile.mkdtemp(prefix="miis_ivm_")
    try:
        # N× corpus: replica r offsets doc_id by r*span. Built with a
        # crossJoin against range(N) — one plan node at any N, where a
        # 1000-way union would drown the optimizer.
        big_docs = os.path.join(work, "documents_big.parquet")
        out = (
            base_df.crossJoin(
                spark.range(args.factor).withColumnRenamed("id", "__r")
            )
            .withColumn("doc_id", F.col("doc_id") + F.col("__r") * span)
            .drop("__r")
        )
        if args.novel:
            out = out.withColumn(
                "text",
                F.concat_ws(
                    " ",
                    F.col("text"),
                    F.concat(F.lit("uniqtok"), F.col("doc_id")),
                ),
            )
        out.repartition(32).write.mode("overwrite").parquet(big_docs)

        regime = "novel" if args.novel else "replicated"
        print(
            f"# regime={regime} factor={args.factor} "
            f"(delta fixed: replica-0 rows only)",
            flush=True,
        )
        for scale, docs_path in ((1, src_docs), (args.factor, big_docs)):
            per = projection(spark, docs_path)
            in_delta_zone = F.col("doc_id") < span  # replica 0
            is_add = (F.col("doc_id") % 5 == 4) & in_delta_zone
            is_del = (
                (F.col("doc_id") % 5 != 4)
                & (F.col("doc_id") % 7 == 3)
                & in_delta_zone
            )
            sdir = os.path.join(work, f"state_{scale}x")
            ddir = os.path.join(work, f"delta_{scale}x")
            # deployment artifacts: aux state over the base, per-doc delta
            (
                per.filter(~is_add)
                .groupBy("source", "lang", "fp")
                .agg(
                    F.count(F.lit(1)).alias("cnt"),
                    F.sum("n_toks").alias("toks"),
                )
                .write.mode("overwrite")
                .parquet(sdir)
            )
            (
                per.filter(is_add)
                .select("source", "lang", "fp", F.lit(1).alias("s"), "n_toks")
                .unionByName(
                    per.filter(is_del).select(
                        "source", "lang", "fp",
                        F.lit(-1).alias("s"), "n_toks",
                    )
                )
                .write.mode("overwrite")
                .parquet(ddir)
            )
            state_rows = spark.read.parquet(sdir).count()
            delta_rows = spark.read.parquet(ddir).count()

            def refresh():
                st = spark.read.parquet(sdir).select(
                    "source", "lang", "fp", "cnt", "toks"
                )
                dl = spark.read.parquet(ddir).select(
                    "source",
                    "lang",
                    "fp",
                    F.col("s").cast("long").alias("cnt"),
                    (F.col("s") * F.col("n_toks")).cast("long").alias("toks"),
                )
                (
                    st.unionByName(dl)
                    .groupBy("source", "lang", "fp")
                    .agg(
                        F.sum("cnt").alias("cnt"),
                        F.sum("toks").alias("toks"),
                    )
                    .filter(F.col("cnt") > 0)
                    .groupBy("source", "lang")
                    .agg(
                        F.sum("cnt").alias("n_docs"),
                        F.sum("toks").alias("n_tokens"),
                        F.count(F.lit(1)).alias("n_unique"),
                    )
                    .write.format("noop")
                    .mode("overwrite")
                    .save()
                )

            def full():
                p2 = projection(spark, docs_path)
                (
                    p2.filter(~is_del)
                    .groupBy("source", "lang")
                    .agg(
                        F.count(F.lit(1)).alias("n_docs"),
                        F.sum("n_toks").alias("n_tokens"),
                        F.countDistinct("fp").alias("n_unique"),
                    )
                    .write.format("noop")
                    .mode("overwrite")
                    .save()
                )

            t_ref = timed(refresh)
            t_full = timed(full)
            print(
                f"scale={scale}x state_rows={state_rows} "
                f"delta_rows={delta_rows} refresh={t_ref:.2f}s "
                f"full_recompute={t_full:.2f}s",
                flush=True,
            )
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
