"""Driver-surface queries for the conversion ETL (SURVEY Phase 2).

e1 runs the whole pipeline — synthesize the docket tree (seeded),
tolerant scan, flatten, partitioned write, re-read — and returns the
landed row counts. The fixture is deterministic, so the oracle is the
ground truth declared by the fixture itself; a hash match means the
scan found every file, quarantined exactly the corrupt ones, and the
flatten/write/re-read cycle lost nothing.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..etl.fixtures import expected_counts, write_docket_tree
from ..etl.pipeline import run_pipeline


def e1_docket_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tree → tables → counts. ``sf_dir`` is unused (the ETL input is
    the synthesized JSON:API tree, not the relational fixtures)."""
    base = tempfile.mkdtemp(prefix="miis_etl_")
    try:
        write_docket_tree(f"{base}/tree")
        result = run_pipeline(spark, f"{base}/tree", f"{base}/out")
        rows = [(t, n) for t, n in sorted(result.counts.items())]
        rows.append(("quarantine", result.quarantined))
        return spark.createDataFrame(rows, "tbl string, n_rows long")
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _oracle() -> str:
    exp = expected_counts()
    rows = [
        ("comments", exp["comments"]),
        ("docket_info", exp["dockets"]),
        ("documents", exp["documents"]),
        ("quarantine", exp["corrupt"]),
    ]
    return "\nUNION ALL\n".join(
        f"SELECT '{t}' AS tbl, {n} AS n_rows" for t, n in rows
    )


E2_MIN_TOKENS = 25  # quality gate: ≈ the corpus' p15 token count
E2_SAMPLE_EVERY = 3  # systematic per-stratum sample stride


def e2_training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's reason-to-exist, composed end-to-end: quality gate →
    exact dedup → near-dup drop → stratified systematic sample →
    per-language corpus summary. Every stage is the scale shape its
    standalone operator uses (t2 projection gate, d1 min-per-
    fingerprint, d2/d6 group-and-pair near-dup with hot-shingle guard,
    o7 per-stratum window), and the whole composition is one
    oracle-checked query — stage interop is what composite pipelines
    usually get wrong, so it is what this checks.
    """
    from pyspark.sql import Window

    from ..tables import load_table
    from .dedup import jaccard_pairs, parallelize_scan
    from .text import tokens_col

    docs = parallelize_scan(load_table(spark, sf_dir, "documents"))
    docs = docs.withColumn("__toks", tokens_col(F.col("text")))
    # The gate gets pushed into the scan (tokenize evaluated there too):
    # deliberate — pruning before the fingerprint exchange beats the
    # extra tokenize of survivors, and on a production multi-row-group
    # layout the scan-side evaluation is fully parallel.
    quality = docs.filter(F.size("__toks") >= E2_MIN_TOKENS)
    fp = quality.withColumn("__fp", F.md5(F.concat_ws(" ", F.col("__toks"))))
    w_fp = Window.partitionBy("__fp")
    # cache(): exact_kept feeds BOTH the survivor side and the near-dup
    # pair pipeline — without it the whole scan→gate→fingerprint-window
    # lineage executes twice (the self-join recompute trap).
    exact_kept = (
        fp.withColumn("__min_id", F.min("doc_id").over(w_fp))
        .filter(F.col("doc_id") == F.col("__min_id"))
        .select("doc_id", "lang", "__toks")
        .cache()
    )
    drops = (
        jaccard_pairs(exact_kept)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    near_kept = exact_kept.join(drops, "doc_id", "left_anti")
    w_lang = Window.partitionBy("lang").orderBy("doc_id")
    selected = near_kept.withColumn("rn", F.row_number().over(w_lang)).filter(
        (F.col("rn") - 1) % E2_SAMPLE_EVERY == 0
    )
    return selected.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("__toks").cast("long")).alias("total_tokens"),
        F.round(F.avg(F.size("__toks")), 4).alias("avg_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def _e2_oracle() -> str:
    from .dedup import SHINGLE_K
    from .text import TOKEN_PATTERN

    return f"""
        WITH toks AS (
            SELECT doc_id, lang,
                   regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS t
            FROM documents
        ), quality AS (
            SELECT * FROM toks WHERE len(t) >= {E2_MIN_TOKENS}
        ), fp AS (
            SELECT *, md5(array_to_string(t, ' ')) AS f FROM quality
        ), exact_kept AS (
            SELECT * FROM fp
            QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY f)
        ), sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       range(1, GREATEST(len(t) - {SHINGLE_K - 1}, 0) + 1),
                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingles
            FROM exact_kept
        ), postings AS (
            SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle
            FROM sh
        ), pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.n_sh AS n_a, b.n_sh AS n_b, COUNT(*) AS common
            FROM postings a JOIN postings b USING (shingle)
            WHERE a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4
        ), drops AS (
            SELECT DISTINCT doc_b AS doc_id FROM pairs
            WHERE ROUND(common / CAST(n_a + n_b - common AS DOUBLE), 4) >= 0.18
        ), near_kept AS (
            SELECT * FROM exact_kept
            WHERE doc_id NOT IN (SELECT doc_id FROM drops)
        ), selected AS (
            SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                                             ORDER BY doc_id) AS rn
                FROM near_kept
            ) WHERE (rn - 1) % {E2_SAMPLE_EVERY} = 0
        )
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(len(t)) AS BIGINT) AS total_tokens,
               ROUND(AVG(len(t)), 4) AS avg_tokens,
               MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        FROM selected GROUP BY lang
    """


N_SHARDS = 16


def e3_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment — the export step after
    curation: every document lands in one of ``N_SHARDS`` shards keyed
    by a content-independent stable hash (first hex digit of
    md5(doc_id), identical in any engine), and the query reports the
    shard manifest a writer would emit. Pure projection + one hash
    agg; at 100 TB the same expression is the ``partitionBy`` column
    of the actual shard write, so balance here is balance on disk.
    """
    from ..tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    shard = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
        )
        - 1
    ).cast("int")
    return (
        docs.withColumn("shard", shard)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_chars").cast("long")).alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("shard")
    )


QUERIES = {
    "e1_docket_pipeline": e1_docket_pipeline,
    "e2_training_pipeline": e2_training_pipeline,
    "e3_shard_assign": e3_shard_assign,
}
ORACLE = {
    "e1_docket_pipeline": _oracle(),
    "e3_shard_assign": """
        WITH s AS (
            SELECT doc_id, lang, n_chars,
                   CAST(strpos('0123456789abcdef',
                               substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
                        AS INT) AS shard
            FROM documents
        )
        SELECT shard, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               COUNT(DISTINCT lang) AS n_langs,
               MIN(doc_id) AS min_doc,
               MAX(doc_id) AS max_doc
        FROM s GROUP BY shard ORDER BY shard
    """,
    "e2_training_pipeline": _e2_oracle(),
}
