#!/usr/bin/env python
"""DuckDB-vs-Spark crossover rows for LLM-shaped operators.

BASELINE.md's measured crossover curve covers the reference's q1-q8
scan/agg shapes; this extends it with the operator families this
engine exists for (VERDICT r10 item #7): d1 (exact dedup — tokenize +
md5 + hash-agg, CPU-heavy per row) and w1 (top-n per group — the
window/partition shape). Protocol mirrors the round-7 curve: the SAME
replicated parquet read by both engines (ids offset per replica,
payloads repeated), warm = best of 2 back-to-back runs per engine,
Spark local[32] noop-write action vs DuckDB default-threads fetchall.

Usage::

    python scripts/crossover.py --factors 1,100,1000
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb  # noqa: E402

from scalestress import ALL_TABLES, ID_COLS, time_query  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from mirrulations_iceberg_spark.operators import collect_queries  # noqa: E402
from mirrulations_iceberg_spark.session import get_spark  # noqa: E402


def _replicate(spark, src: str, dst: str, factor: int, tables) -> None:
    """scalestress.build_corpus's layout, but replication via ONE
    broadcast crossJoin with range(factor) — a 1000-way unionByName
    plan is quadratic in the analyzer at the factors this curve
    needs."""
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
        spans = {
            c: (base.agg(F.max(c)).collect()[0][0] or 0) + 1
            for c in ID_COLS.get(t, ())
        }
        rep = base.crossJoin(
            F.broadcast(spark.range(factor).withColumnRenamed("id", "__r"))
        )
        for c, span in spans.items():
            rep = rep.withColumn(c, F.col(c) + F.col("__r") * F.lit(span))
        rep.drop("__r").repartition(32).write.mode("overwrite").parquet(
            dst_path
        )

#: query -> the one fact table it reads (replicated; the rest symlink)
TARGETS = {
    "d1_exact_dedup": "documents",
    "w1_topn_per_group": "orders",
    # ANN row (VERDICT r11 item #8): the PQ fit→encode→ADC pipeline —
    # corpus-linear encode on both engines, so the ratio isolates
    # engine overhead on the x-family's dominant shape.
    "x9_pq_adc_topk": "embeddings",
    # Sketch row (r13): 16 min-of-md5 aggregators over the exploded
    # shingle stream + the exact posting-set grade — the string-hash
    # aggregation shape (d1 is one md5/doc; this is K per shingle).
    "d20_minhash_source_sketch": "documents",
    # Binary-quantization row (r13): pack folds once per vector, then
    # pure integer bit_count(XOR) scoring — the most codegen-friendly
    # ANN shape, so the earliest-crossover candidate.
    "x22_binary_hamming_topk": "embeddings",
    # Chunking row (r13): regex tokenize + explode + slice + md5 per
    # chunk — the CPU-dense zero-shuffle projection shape (d1's
    # family, with a generator and per-chunk hashing on top).
    "t21_chunk_documents": "documents",
    # Perceptual-hash row (r13): per-image 64-cell decode + pack, then
    # band joins over distinct hashes — Arrow-batched Python decode on
    # the Spark side vs a 64×N unnest on the DuckDB side.
    "mm6_phash_neardup": "documents",
    # Repetition-filter row (r14): tokenize + bigram explode + two
    # doc-keyed hash-aggs — the heaviest explode volume on the curve
    # (one row per token AND per bigram), so the purest test of
    # shuffle-with-map-side-combine vs DuckDB's single-node unnest.
    "t22_intra_doc_repetition": "documents",
    # Video frame-signature row (r14): strided binary slicing + md5
    # per frame, signature collapse, postings self-join — mm6's
    # family with JVM-only decode (no Python anywhere).
    "mm7_video_framesig_neardup": "documents",
    # Audio fingerprint row (r15): Arrow-batched numpy quantize decode
    # + JVM shingle md5 + mm7's containment machinery — the mm7 shape
    # with a Python decode stage in front (mm6's regime), so the ratio
    # shows what the mapInPandas hop costs at corpus scale.
    "mm8_audio_fingerprint_neardup": "documents",
    # DSIR row (r15): two corpus scans with a 2-feature-per-token
    # explode each (distribution count, then pure-projection scoring)
    # — the heaviest explode volume on the curve after t22, plus the
    # e6 greedy-selection machinery on top.
    "e18_dsir_resample": "documents",
    # Filter-ablation row (r15): token-level hash-agg -> per-doc
    # rollup -> spine join -> one boolean-sum aggregate — the pure
    # curation-report shape (no pairing, no model).
    "e19_filter_ablation": "documents",
    # Language-ID row (r15): two scans, char-trigram explode (the
    # heaviest per-char volume on the curve) and a x|langs| broadcast
    # scoring join with per-(doc, lang) map-side combine.
    "t23_char_ngram_langid": "documents",
    # Threshold-sweep row (r16): e19's token stats computed once, the
    # 20-point grid as 60 conditional sums in one map-side-combined
    # aggregate — tests whether sweep width is really free at corpus
    # scale (the DuckDB oracle pays a 20x cross join instead).
    "e19b_filter_threshold_sweep": "documents",
    # Predicted-language card row (r16): t23's two model passes + one
    # card scan + a doc-keyed equi-join + grouping sets — the full
    # self-labeling composition; the DuckDB side replays the whole
    # t23 CTE chain before the card, so the ratio shows what oracle-
    # replayability costs the single-node engine at volume.
    "t24_predlang_dataset_card": "documents",
}


def duck_time(sf_dir: str, sql: str, runs: int = 2) -> float:
    con = duckdb.connect()
    for t in ALL_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        con.execute(sql).fetchall()
        best = min(best, time.time() - t0)
    con.close()
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--factors", default="1,100,1000")
    ap.add_argument("--queries", default=",".join(TARGETS))
    args = ap.parse_args()
    queries, oracles = collect_queries()
    spark = get_spark()
    names = args.queries.split(",")
    for factor in [int(f) for f in args.factors.split(",")]:
        tables = sorted({TARGETS[n] for n in names})
        tmp = tempfile.mkdtemp(prefix=f"xover{factor}x-")
        try:
            _replicate(spark, args.src, tmp, factor, tables)
            for name in names:
                t = TARGETS[name]
                path = os.path.join(tmp, f"{t}.parquet")
                n_rows = duckdb.sql(
                    f"SELECT COUNT(*) FROM read_parquet('{path}/*.parquet')"
                    if os.path.isdir(path)
                    else f"SELECT COUNT(*) FROM read_parquet('{path}')"
                ).fetchone()[0]
                d = duck_time(tmp, oracles[name])
                s = time_query(spark, queries[name], tmp)
                print(
                    f"{name} x{factor} rows={n_rows} duckdb={d:.3f}s "
                    f"spark={s:.3f}s ratio={s / d:.2f}",
                    flush=True,
                )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
