"""Core relational operators — the reference's entire SQL/pandas workload.

Re-expresses every query the reference actually executes (DuckDB SQL in
``demo_optimized_data.py:92-119`` / ``simple_iceberg_exploration.py:320-328``
and the pandas analytics in ``demo_optimized_data.py:48-80,137-169``) as
native DataFrame plans over the driver's synthetic tables. Operator IDs in
function names refer to SURVEY.md §2 rows (F=filter, A=aggregation,
O=order/limit, C=scalar).

Scale notes (100 TB design stance):

* Every aggregation here is a hash aggregate with map-side partial
  aggregation — Catalyst's default — so the shuffle carries one row per
  (partition, group), not per input row.
* Every top-k is ``ORDER BY … LIMIT k`` which Spark plans as
  ``TakeOrderedAndProject`` — per-partition heaps + a k-row driver merge;
  no global sort, no full shuffle.
* Filters and projections are plain column expressions so they reach the
  Parquet scan as pushed filters / pruned columns.
* Multi-statistic profiles (A5, A8) are a *single* ``agg`` pass — one scan
  — rather than the reference's one-pass-per-column pandas loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table

# ---------------------------------------------------------------------------
# F — filters / predicates (SURVEY §2.3; demo_optimized_data.py:92-119)
# ---------------------------------------------------------------------------


def f1_like_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: substring search, the reference's ``LIKE '%health%'``
    (simple_iceberg_exploration.py:324) on the documents fixture.

    At 100 TB a bare ``%x%`` is a full scan; the scan here is at least
    column-pruned to (text, doc_id, lang, n_chars) and the limit is a
    TakeOrderedAndProject. The scale path is the inverted token table in
    :mod:`.text` (token_index) — flagged in SURVEY §4.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("text").contains("hash"))
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
        .limit(10)
    )


#: f1b's needle. The index answers substring needles that are wholly
#: lowercase-alphanumeric: such a needle can never span a token
#: separator, and lowercasing preserves it, so every raw-text match
#: lies inside one lowered ``[a-z0-9]+`` token → token-level contains
#: is a complete candidate generator; the raw-text verify then trims
#: case mismatches ("Hash" yields token "hash" but fails the verify).
F1B_NEEDLE = "hash"


def f1b_indexed_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 answered from the inverted token index (SURVEY §4's promised
    mitigation for the reference's ``LIKE '%health%'`` full scan,
    ``simple_iceberg_exploration.py:324`` / ``demo_optimized_data.py:112``).

    Path: (1) candidate lookup — scan the materialized
    (token, token_orig, doc_id) index with ``token CONTAINS
    lower(needle)``; (2) exact verify — case-sensitive ``contains`` on
    the candidates' original-case surface forms (``token_orig``), so
    the verify runs on index rows, never by re-scanning corpus text;
    (3) fetch — join the verified doc_ids back to documents for the
    output columns. The oracle is f1's *plain scan* SQL, so the
    driver's hash check proves index path ≡ scan path.

    Why this is exact for f1's needle: "hash" is wholly
    lowercase-alphanumeric, so a raw-text occurrence can never span a
    token separator and must lie inside one maximal ``[A-Za-z0-9]+``
    run — whose surface form is exactly one ``token_orig`` value.
    Needles outside that class (embedded spaces/punctuation, or
    non-ASCII case pairs) must fall back to the f1 scan path — the
    word-boundary-vs-substring contract is in PLANS.md.

    At 100 TB: the index is written once at ingest (bucketBy(token)
    parquet — stood in here by a per-query temp parquet). The query
    reads the index's narrow dictionary-encoded token columns and a
    3-column slice of documents; the corpus ``text`` column is not
    read at all (plan-asserted: the documents scan's ReadSchema
    excludes text). Word-boundary lookups (``token = needle``)
    additionally bucket-prune on the index layout.
    """
    import shutil
    import tempfile

    from .text import build_token_index

    docs = load_table(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="miis_f1b_idx_")
    try:
        build_token_index(docs, with_original=True).write.mode(
            "overwrite"
        ).parquet(tmp)
        out = indexed_substring_search(docs, spark.read.parquet(tmp))
        # materialize before the temp index is removed (j10 pattern)
        rows = [tuple(r) for r in out.collect()]
        return spark.createDataFrame(
            rows, "doc_id bigint, lang string, n_chars bigint"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


#: f1c: which documents arrive "later" (the delta batch); the base
#: corpus is indexed at ingest, the delta's postings are APPENDED.
#: ONE split convention across the repo: this IS d10/e9/m14's constant
#: (imported, not shadowed — retuning the convention moves them all).
from .dedup import D10_DELTA_MOD as F1C_DELTA_MOD  # noqa: E402
from .text import TOKEN_PATTERN  # noqa: E402  (o11's oracle twin)


def f1c_index_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of f1b's inverted index — the d10
    delta-vs-base shape applied to index postings, completing SURVEY
    §4's production story ("a precomputed inverted-token table
    MAINTAINED as a separate table"): rebuilding a corpus-sized index
    per delta batch is the one cost that would kill the design at
    100 TB, so the refresh writes ONLY the delta's postings (an
    append — with bucketBy(token) layout both base and delta cluster
    the same way, so lookups stay co-located).

    Base = documents with ``doc_id % F1C_DELTA_MOD != 0`` indexed "at
    ingest"; delta = the rest arriving later; postings appended; the
    same candidate+verify lookup then runs over the unioned index.
    The oracle is f1's full-corpus plain-scan SQL — so the driver
    hash proves refreshed-index ≡ full-rebuild ≡ scan, the exact
    invariant an incremental index must keep.
    """
    import shutil
    import tempfile

    from .text import build_token_index

    docs = load_table(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="miis_f1c_idx_")
    try:
        base = docs.filter(F.col("doc_id") % F1C_DELTA_MOD != 0)
        delta = docs.filter(F.col("doc_id") % F1C_DELTA_MOD == 0)
        build_token_index(base, with_original=True).write.mode(
            "overwrite"
        ).parquet(tmp)
        build_token_index(delta, with_original=True).write.mode(
            "append"
        ).parquet(tmp)
        out = indexed_substring_search(docs, spark.read.parquet(tmp))
        rows = [tuple(r) for r in out.collect()]
        return spark.createDataFrame(
            rows, "doc_id bigint, lang string, n_chars bigint"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def indexed_substring_search(
    docs: DataFrame, index: DataFrame, needle: str = F1B_NEEDLE
) -> DataFrame:
    """The lazy index-lookup + verify query (plan-asserted in
    tests/test_plans.py::test_f1b_answers_without_reading_text).

    Candidate filter (lowered token) and case-sensitive verify
    (original surface form) are declared as two steps; Catalyst fuses
    them into one pass over the index scan — which is the plan you
    want, since both touch only index columns.
    """
    verified = (
        index.filter(F.col("token").contains(needle.lower()))
        .filter(F.col("token_orig").contains(needle))
        .select("doc_id")
        .distinct()
    )
    return (
        docs.join(verified, "doc_id", "left_semi")
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
        .limit(10)
    )


def f2_is_not_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: ``WHERE firstName IS NOT NULL`` (demo_optimized_data.py:100).

    The fixture has no natural NULLs, so NULLs are derived with
    ``nullif`` — exercising both the null-production and null-filter
    paths.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("non_en_lang", F.nullif(F.col("lang"), F.lit("en")))
        .filter(F.col("non_en_lang").isNotNull())
        .groupBy("non_en_lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("non_en_lang")
    )


def f3_boolean_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: boolean-equality filter (``has_attachments = true``,
    demo_optimized_data.py:95) via a derived boolean column."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.withColumn("has_discount", F.col("l_discount") > F.lit(0.05))
        .filter(F.col("has_discount"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def f4_conjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: conjunctive filter + LENGTH predicate
    (demo_optimized_data.py:113-118). All three predicates are
    scan-pushable Parquet filters."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_returnflag") == "R")
            & (F.col("l_quantity") > 30)
            & (F.col("l_extendedprice") > 1000)
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


def g1_glob_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 (§2.1): glob-pattern read — a path PATTERN instead of a
    concrete file (the reference's ``glob.glob`` walks,
    ``convert_to_iceberg.py:512-553``; Spark's file index expands the
    pattern at listing time, so pruning happens before any task
    launches). The aggregate fingerprints the matched set: row count,
    id checksum and language span only come out right if the glob
    matched exactly the documents file — making S5 a driver-checkable
    row rather than a pytest-only claim (VERDICT r5)."""
    import os

    df = spark.read.parquet(os.path.join(sf_dir, "docum*.parquet"))
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("doc_id").alias("id_checksum"),
        F.countDistinct("lang").alias("n_langs"),
    )


_ROUNDTRIP_SCHEMA = "doc_id long, text string, lang string, n_chars long"


def _roundtrip_fingerprint(df: DataFrame) -> DataFrame:
    """Content fingerprint that only comes out right if a sink→source
    round trip preserved every row, every column, and every text byte:
    row count, id/char sums, a 40-bit-md5 text checksum (the d4
    cross-engine hash convention, 10 hex chars so a corpus-wide SUM
    stays far inside BIGINT), and the language span."""
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("doc_id").alias("id_checksum"),
        F.sum(F.col("n_chars").cast("long")).alias("chars_total"),
        F.sum(
            F.conv(F.substring(F.md5(F.col("text")), 1, 10), 16, 10).cast("long")
        ).alias("text_checksum"),
        F.countDistinct("lang").alias("n_langs"),
    )


def _run_roundtrip(spark: SparkSession, sf_dir: str, write, read) -> DataFrame:
    """Shared g2/g3 driver: sink documents to a temp dir with ``write``,
    load it back with ``read``, fingerprint, clean up. The fingerprint
    is collected (1 row) before the temp dir is removed — the m11
    pattern for operators whose input is their own sink output."""
    import shutil
    import tempfile

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    base = tempfile.mkdtemp(prefix="miis_roundtrip_")
    try:
        path = f"{base}/docs"
        write(docs, path)
        row = _roundtrip_fingerprint(read(spark, path)).collect()[0]
        return spark.createDataFrame(
            [row],
            "n_rows long, id_checksum long, chars_total long, "
            "text_checksum long, n_langs long",
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def g2_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-extension: CSV sink → CSV source round trip (another source
    format beyond the reference's JSON→Parquet pair).

    Production stances exercised for real: the sink writes RFC-4180
    quoting (``quoteAll`` + ``escape='"'`` — doubled quotes, so
    embedded commas/quotes survive any reader); the source reads with
    an EXPLICIT schema — ``inferSchema`` is a full extra pass over
    100 TB and is never acceptable — plus ``multiLine`` for embedded
    newlines. ``multiLine`` makes a CSV file non-splittable (one task
    per file: the parser can't resync mid-quote), which is the
    documented reason text interchange at scale uses JSONL (g3) —
    here the sink writes 4 files, so parallelism survives as
    one-task-per-file. Oracle: the same fingerprint computed from the
    parquet table directly — it hash-matches iff the text format
    round-tripped losslessly.
    """
    return _run_roundtrip(
        spark,
        sf_dir,
        lambda df, p: (
            df.repartition(4)
            .write.mode("overwrite")
            .option("header", True)
            .option("quoteAll", True)
            .option("escape", '"')
            # the WRITER trims whitespace by default (ignore*WhiteSpace
            # default true on write, false on read — asymmetric!), which
            # silently corrupts whitespace-significant text; found by
            # the hypothesis round-trip property on texts=[" "]
            .option("ignoreLeadingWhiteSpace", False)
            .option("ignoreTrailingWhiteSpace", False)
            # CSV can't distinguish "" from NULL by itself: the reader
            # maps a quoted empty to null. A null sentinel (matched on
            # read) keeps both distinct, at CSV's inherent price: a
            # document whose text IS the sentinel would read back null.
            # JSONL (g3) has no such ambiguity — one more reason it is
            # the at-scale interchange format.
            .option("nullValue", "\\N")
            .csv(p)
        ),
        lambda s, p: (
            s.read.schema(_ROUNDTRIP_SCHEMA)
            .option("header", True)
            .option("multiLine", True)
            .option("quote", '"')
            .option("escape", '"')
            .option("ignoreLeadingWhiteSpace", False)
            .option("ignoreTrailingWhiteSpace", False)
            .option("nullValue", "\\N")
            .csv(p)
        ),
    )


def g3_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-extension: JSON-Lines sink → source round trip — the
    interchange format LLM training corpora actually ship in (one JSON
    object per line: newlines inside values are ``\\n``-escaped, so
    files stay line-splittable and a 100 TB corpus scans with full
    parallelism — the property CSV-with-multiLine (g2) gives up).
    Source reads with an explicit schema: no sampling pass, and
    documents the production contract that unknown fields are dropped
    rather than silently widening the schema. Same lossless-round-trip
    oracle as g2.
    """
    return _run_roundtrip(
        spark,
        sf_dir,
        lambda df, p: df.repartition(4).write.mode("overwrite").json(p),
        lambda s, p: s.read.schema(_ROUNDTRIP_SCHEMA).json(p),
    )


def g4_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-extension: ORC sink → source round trip — the second columnar
    format large Hive-lineage estates still carry alongside Parquet; a
    "switch your engine, keep your files" claim needs both. Binary
    columnar, so none of g2's text-format ambiguities exist (nulls,
    empties and any byte sequence survive natively); stripes are
    splittable and the vectorized ORC reader handles predicate
    pushdown, so the 100 TB scan story matches Parquet's. Same
    lossless-round-trip fingerprint oracle as g2/g3.
    """
    return _run_roundtrip(
        spark,
        sf_dir,
        lambda df, p: df.repartition(4).write.mode("overwrite").orc(p),
        lambda s, p: s.read.schema(_ROUNDTRIP_SCHEMA).orc(p),
    )


# ---------------------------------------------------------------------------
# A — aggregations (SURVEY §2.4)
# ---------------------------------------------------------------------------


def a1_count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: global COUNT(*) (simple_iceberg_exploration.py:322)."""
    return load_table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("cnt"))


def a2_groupby_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: GROUP BY agencyId COUNT(*) (simple_iceberg_exploration.py:323);
    low-cardinality key → partial agg makes the shuffle tiny."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("l_returnflag")
    )


def a3_multikey_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3+O1: multi-key GROUP BY + top-k ("top 5 commenters",
    demo_optimized_data.py:97-104). Tie-broken total order before LIMIT."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "o_orderpriority", "o_orderstatus")
        .limit(5)
    )


def a4_avg_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: AVG(LENGTH(comment)) (demo_optimized_data.py:96)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(F.round(F.avg(F.length("text")), 4).alias("avg_text_len"))


def a5_numeric_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: mean/median/min/max (demo_optimized_data.py:63-66), one pass.

    ``median`` is exact here to match the oracle; the 100 TB variant is
    ``percentile_approx`` (single-pass sketch, no global sort) — exposed
    as a5b below.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.avg("l_extendedprice"), 4).alias("mean_price"),
        F.median("l_extendedprice").alias("median_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


def a5b_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 at 100 TB: percentile_approx + approx_count_distinct — both
    single-pass mergeable sketches (no global sort, no distinct-expand
    shuffle; partial sketches merge map-side like any other agg).

    Sketch estimates are engine-specific, so they can't be
    hash-compared raw — instead (round 6) the query audits them
    IN-PLAN and emits the verdicts as data: ``median_ok`` checks the
    sketch median by its RANK (count of rows ≤ it must sit within 1%
    of n/2 — percentile_approx at accuracy 10k guarantees rank error
    ≤ n/10⁴, so TRUE is robust at any sf), and ``distinct_ok`` checks
    HLL against the exact distinct count (within 3× its 1% rsd). The
    oracle reproduces the exact columns and expects both verdicts
    TRUE, turning the former rows-only row into a full hash-checked
    one. The rank audit is deliberately NOT `percentile(…)` — Spark's
    exact percentile buffers every value of the group in one
    aggregator (the first version of this query did that and bench's
    contention defense flagged it at 13.6 s vs 0.8 s prior); the rank
    check is two scans and plain hash-aggs, shapes that survive 100 TB.

    Flake budget (ADVICE r6): ``distinct_ok`` asserts HLL lands within
    3σ of its 1% rsd — a ~0.3% a-priori miss probability *per fresh
    fixture*, not per run: both engines are deterministic on fixed
    data, so a fixture that passes once passes every round (current
    fixtures verified). If a future fixture regeneration ever lands
    outside 3σ, widen to 4σ rather than relaxing the audit's shape.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sketch = li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10_000).alias("__med_approx"),
        F.approx_count_distinct("l_partkey", 0.01).alias("__parts_approx"),
    )
    audited = li.join(F.broadcast(sketch)).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.avg("l_extendedprice"), 4).alias("mean_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.countDistinct("l_partkey").alias("n_parts_exact"),
        F.sum((F.col("l_extendedprice") <= F.col("__med_approx")).cast("long"))
        .alias("__rank_m"),
        F.first("__parts_approx").alias("__pa"),
    )
    return audited.select(
        "n_rows",
        "mean_price",
        "min_price",
        "max_price",
        "n_parts_exact",
        (
            F.abs(F.col("__rank_m") - F.col("n_rows") / 2.0)
            <= 0.01 * F.col("n_rows") + 1
        ).alias("median_ok"),
        (
            F.abs(F.col("__pa") - F.col("n_parts_exact"))
            <= F.greatest(
                0.03 * F.col("n_parts_exact").cast("double"), F.lit(1.0)
            )
        ).alias("distinct_ok"),
    )


def a6_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: nunique (demo_optimized_data.py:56). Exact here; the 100 TB
    variant is approx_count_distinct (HLL, no distinct-expand shuffle)."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
    )


def a7_boolean_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: sum of booleans (demo_optimized_data.py:57-58)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.sum((F.col("l_discount") > 0.05).cast("long")).alias("n_discounted"),
        F.sum((F.col("l_tax") == 0).cast("long")).alias("n_taxfree"),
    )


def a8_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: per-column null counts (demo_optimized_data.py:142-148) as ONE
    aggregate pass over all columns — the reference loops per column."""
    docs = load_table(spark, sf_dir, "documents")
    aggs = [
        F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
        for c in docs.columns
    ]
    return docs.agg(*aggs)


def a9_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: value_counts on a key column (demo_optimized_data.py:158-169)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "lang")
    )


def a10_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: GROUP BY DATE(postedDate) (demo_optimized_data.py:105-111)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.to_date("o_orderdate").alias("order_date"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("order_date")
    )


# ---------------------------------------------------------------------------
# O — sorts / limits / top-k (SURVEY §2.5)
# ---------------------------------------------------------------------------


def o2_top_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: top-k dates by count (demo_optimized_data.py:105-111).
    TakeOrderedAndProject — no global sort at any scale."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.to_date("o_orderdate").alias("order_date"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "order_date")
        .limit(5)
    )


def o4_peak_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: argmax — peak posting day (demo_optimized_data.py:77-78)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.to_date("o_orderdate").alias("order_date"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "order_date")
        .limit(1)
    )


# ---------------------------------------------------------------------------
# C — scalar function suite (SURVEY §2.9, C1-C13)
# ---------------------------------------------------------------------------


def c_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1-C13 in one projection: length, contains→flag, concat, split/
    getItem, upper, startswith, rlike, to_date, size-analog, arithmetic.

    Mirrors the reference's scalar vocabulary (SURVEY §2.9) including the
    agency-extraction rule ``split('-')[0]`` (convert_to_iceberg.py:404-411).
    """
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.length("p_name").alias("name_len"),  # C1
            F.col("p_name").contains("red").alias("is_red"),  # C2
            F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),  # C3
            F.split(F.col("p_brand"), "#").getItem(0).alias("brand_prefix"),  # C4
            F.upper("p_type").alias("type_upper"),  # C5
            F.col("p_name").startswith("small").alias("is_small_name"),  # C6
            F.col("p_name").rlike("^[a-z]+ (ring|bolt)$").alias("matches_pattern"),  # C7
            (F.col("p_retailprice") * 1.1).cast("decimal(18,2)").cast("double").alias("taxed_price"),  # C13/C14
        )
        .orderBy("p_partkey")
        .limit(50)
    )


def c_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C15 (gap row): JSON path extraction at query time over
    ``events.props`` — ``get_json_object`` stays in codegen (no UDF)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .orderBy("k_mod")
    )


HIST_WIDTH = 10_000  # fixed-bound bins: floor(price / width)


def a14_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width numeric histogram with FIXED bounds — one pass, one
    tiny aggregate (bin = floor(x / width)). Fixed bounds are the
    100 TB form: data-driven bounds need a min/max pass first (or
    a5b's single-pass sketch); empty bins are absent on both engines
    by construction."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.floor(F.col("o_totalprice") / HIST_WIDTH)
            .cast("long")
            .alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
        .orderBy("bin")
    )


def a12_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 (gap row): ROLLUP over (status, priority) — subtotal rows and
    the grand total in ONE aggregation pass (Spark expands the grouping
    sets map-side; no repeated scans)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )


A15_BUCKET_W = 64  # histogram bucket width over documents.n_chars
A15_QS = ((50, "p50"), (90, "p90"), (99, "p99"))  # percent targets


def a15_exact_quantile_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT quantiles without a global sort — the two-pass histogram
    trick that makes "median of 100 TB" tractable: pass 1 is an
    equal-width bucket count (a14's shape) plus a running total over
    the BOUNDED histogram to locate, for each target rank, the bucket
    holding it and the offset inside; pass 2 sorts ONLY the selected
    buckets (each ~bucket-sized, never corpus-sized) and picks the
    element at the offset. a5b gives approximate percentiles in one
    pass; this is the exact complement when the answer must be a real
    corpus value (rank = ``floor(q·(n−1))``, the lower-value
    convention — all-integer, no interpolation, no floats anywhere).

    Scale shape: no global ``orderBy`` ever exists in the plan — the
    only sorts are inside the ≤3 selected buckets. The running sum's
    single-partition window runs over the histogram, whose row count is
    value-range/width — a constant of the DOMAIN, not the data (t12's
    bucket-rollup argument). Target ranks ride on a broadcast 1-row
    count; bucket selection is a 3-row broadcast nested-loop against
    the histogram; nothing about the corpus shuffles except the bucket
    count hash-agg.
    """
    docs = load_table(spark, sf_dir, "documents")
    # quantiles are over non-null values (and NULL buckets would sort
    # NULLS FIRST here vs DuckDB's NULLS LAST — exclude them explicitly)
    vals = docs.filter(F.col("n_chars").isNotNull()).select(
        F.col("n_chars").alias("v"),
        F.expr(f"n_chars DIV {A15_BUCKET_W}").alias("bucket"),
    )
    hist = vals.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    wc = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    hist = hist.withColumn(
        "cum_before", F.coalesce(F.sum("cnt").over(wc), F.lit(0))
    )
    n_df = vals.agg(F.count(F.lit(1)).alias("__n"))
    targets = (
        spark.createDataFrame(list(A15_QS), "q int, quantile string")
        .join(F.broadcast(n_df))
        .withColumn("k", F.expr("(q * (__n - 1)) DIV 100"))
    )
    sel = (
        targets.join(
            F.broadcast(hist),
            (F.col("cum_before") <= F.col("k"))
            & (F.col("k") < F.col("cum_before") + F.col("cnt")),
        )
        .select(
            "quantile",
            "__n",
            "k",
            "bucket",
            (F.col("k") - F.col("cum_before")).alias("off"),
        )
    )
    w_in = Window.partitionBy("bucket").orderBy("v")
    return (
        vals.join(F.broadcast(sel.select("bucket").distinct()), "bucket")
        .withColumn("rn", F.row_number().over(w_in) - 1)
        .join(F.broadcast(sel), "bucket")
        .filter(F.col("rn") == F.col("off"))
        .select(
            "quantile",
            F.col("__n").alias("n"),
            F.col("k").alias("k_rank"),
            F.col("v").alias("exact_value"),
        )
        .orderBy("quantile")
    )


def o6_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6: deterministic systematic row sample (key mod N) — unlike
    TABLESAMPLE it is reproducible across engines AND pushes to the
    scan as a cheap predicate. Aggregates the sample so the result is
    O(1) regardless of corpus size."""
    orders = load_table(spark, sf_dir, "orders")
    sample = orders.filter(F.col("o_orderkey") % 20 == 7)
    return sample.agg(
        F.count(F.lit(1)).alias("sample_rows"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


def a12b_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 (cube half): full cube over (status, priority) — all four
    grouping sets in ONE pass (Expand + single aggregate), vs four
    scans if written naively."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total"),
    )


PIVOT_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def a13_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user-cohort event counts, one column per event type.
    The value list is declared explicitly — with it Spark plans a
    single-pass pivot aggregate; without it a separate distinct-values
    job must run first (never do that at 100 TB)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("cohort", (F.col("user_id") % 10).alias("cohort"))
        .groupBy("cohort")
        .pivot("event_type", list(PIVOT_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(PIVOT_EVENT_TYPES))  # absent combo = 0, as in SQL
        .orderBy("cohort")
    )


def o7_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O7: stratified systematic sample — every 10th document per
    language stratum (row_number over a per-stratum order, keep
    rn % 10 == 1). Unlike ``sampleBy`` this is reproducible across
    engines and guarantees per-stratum coverage; the per-stratum
    window is one shuffle on the stratum key, and WindowGroupLimit
    does not apply but the filter keeps only 1/10 before the final
    tiny aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("doc_id")
    sample = docs.withColumn("rn", F.row_number().over(w)).filter(
        (F.col("rn") - 1) % 10 == 0
    )
    return sample.groupBy("lang").agg(
        F.count(F.lit(1)).alias("sample_rows"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
        F.sum(F.col("n_chars").cast("long")).alias("sample_chars"),
    ).orderBy("lang")


O10_QUOTA = 5  # rows kept per stratum
O10_SEED = 1313


def o10_stratified_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O10: EXACT-quota stratified sample — exactly ``O10_QUOTA`` rows
    per source, drawn in a seeded-hash random order. ``sampleBy`` gives
    only expected fractions (a Bernoulli coin per row); an eval-set or
    annotation batch needs exact counts per stratum. The order key is
    md5(seed:doc_id) — reproducible on any cluster size and across
    engines, re-seedable per draw.

    Scale shape: one shuffle on the stratum key, and because the
    filter is ``row_number() <= k`` Catalyst rewrites the window to a
    per-partition top-k (WindowGroupLimit): each map task keeps only
    its local k rows per stratum before the exchange, so a skewed
    stratum never sorts corpus-sized input. Output is quota × |strata|
    rows at any corpus size.

    Oracle: identical ROW_NUMBER + md5 key in DuckDB (ties impossible
    — the key embeds the unique doc_id).
    """
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(
        F.concat(F.lit(f"{O10_SEED}:"), F.col("doc_id").cast("string"))
    )
    w = Window.partitionBy("source").orderBy("skey")
    return (
        docs.select("doc_id", "source", "n_chars", key.alias("skey"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= O10_QUOTA)
        .select("source", "rk", "doc_id", "n_chars", "skey")
        .orderBy("source", "rk")
    )


def o8_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O8: deterministic train/holdout assignment — the stable split a
    training pipeline needs (membership must not change when the corpus
    grows or reshuffles). Keyed on md5(doc_id), which both engines
    compute identically, so the oracle checks the exact assignment;
    first hex nibble < 'd' ⇒ train (13/16 ≈ 81%). Pure projection +
    tiny aggregate: no shuffle of the corpus, no sampling state."""
    docs = load_table(spark, sf_dir, "documents")
    split = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "d", "train"
    ).otherwise("holdout")
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_chars").cast("long")).alias("total_chars"),
        )
        .orderBy("split")
    )


O12_TRAIN_DAYS = 21  # train window: first N observed days
O12_EMBARGO_DAYS = 2  # purge gap between train end and test start


def o12_temporal_embargo_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-extension: leakage-safe TEMPORAL train/test split with an
    embargo gap, plus the leakage AUDIT — o8 splits by hash (valid
    when rows are exchangeable); time-ordered data (events, market
    ticks, user logs) must split by TIME or the model trains on the
    future, and an ``O12_EMBARGO_DAYS`` purge between train end and
    test start keeps boundary-straddling activity (sessions, label
    horizons) out of both sides — the purged/embargoed split of
    financial ML practice.

    The split alone is not the deliverable; the AUDIT is: entity-level
    leakage survives any row-level time split (the same user appearing
    in train AND test leaks user-specific signal), so the output
    reports, per event_type, the event counts per side plus
    ``u_both`` (users present in both train and test) and ``leak_bp``
    — the number that tells you whether this corpus needs a BY-USER
    split instead. Boundaries derive from the data (min observed day
    + offsets), not wall-clock, so the operator is deterministic on
    any fixture.

    Scale shape: ONE events scan → per-(type, user) flag/count
    aggregate (map-side combine) → per-type rollup. Two key shuffles,
    both on aggregated rows; nothing event-sized crosses twice; the
    driver-side ``min(day)`` is a 1-row bounded collect (the x15
    fit-literal discipline).
    """
    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "event_type", "user_id", F.to_date("ts").alias("day")
    )
    d0 = ev.agg(F.min("day").alias("d0")).collect()[0]["d0"]
    train_end = F.date_add(F.lit(d0), O12_TRAIN_DAYS - 1)
    test_start = F.date_add(F.lit(d0), O12_TRAIN_DAYS + O12_EMBARGO_DAYS)
    flagged = ev.select(
        "event_type",
        "user_id",
        F.when(F.col("day") <= train_end, 1).otherwise(0).alias("is_tr"),
        F.when(
            (F.col("day") > train_end) & (F.col("day") < test_start), 1
        )
        .otherwise(0)
        .alias("is_em"),
        F.when(F.col("day") >= test_start, 1).otherwise(0).alias("is_te"),
    )
    per_user = flagged.groupBy("event_type", "user_id").agg(
        F.sum("is_tr").alias("n_tr"),
        F.sum("is_em").alias("n_em"),
        F.sum("is_te").alias("n_te"),
        F.max("is_tr").alias("in_tr"),
        F.max("is_te").alias("in_te"),
    )
    return (
        per_user.groupBy("event_type")
        .agg(
            F.sum("n_tr").cast("long").alias("n_train"),
            F.sum("n_em").cast("long").alias("n_embargo"),
            F.sum("n_te").cast("long").alias("n_test"),
            F.sum("in_tr").cast("long").alias("u_train"),
            F.sum("in_te").cast("long").alias("u_test"),
            F.sum(F.col("in_tr") * F.col("in_te"))
            .cast("long")
            .alias("u_both"),
        )
        .withColumn(
            "leak_bp",
            F.expr(
                "CAST((10000 * u_both) DIV GREATEST(u_test, 1) AS BIGINT)"
            ),
        )
        .orderBy("event_type")
    )


O13_FOLDS = 5  # k for the grouped k-fold assignment


def o13_group_kfold_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O13: GROUP-aware k-fold CV assignment — the eval-hygiene split
    o8 (row hash) and o12 (time + embargo) don't cover: when rows
    cluster under an entity (all events of a user, all comments of a
    docket), a row-level split leaks entity-specific signal across
    folds, so EVERY row of an entity must land in ONE fold — the
    sklearn ``GroupKFold`` contract, and the assumption d17's
    split-leakage audit grades after the fact. Here the assignment is
    deterministic (fold = first 12 bits of md5(user_id) mod k, the
    o8/o9 stability idiom): membership depends only on the entity key,
    never on corpus size, partitioning, or a seed, so folds are stable
    under corpus growth — an entity keeps its fold when new rows
    arrive, which no counting-based balancer guarantees.

    The audit is computed FROM THE DATA, not assumed: per entity we
    count distinct observed folds (>1 would mean the fold expression
    leaked row-level terms), and the per-fold report carries that
    ``cross_fold_users`` count — zero by construction, but proven on
    every run, so a refactor that accidentally keys the hash on a
    row column fails the oracle loudly rather than silently leaking.

    Scale shape: one events scan → per-(user) aggregate (map-side
    combine; output is #entities rows, not #events) → k-row rollup →
    the share denominator joins in as a BROADCAST 1-row total (the o9
    idiom; ADVICE r14 — an unpartitioned Window would single-partition
    the frame and trip the repo's no-global-window discipline even on
    k rows). Nothing event-sized shuffles twice; no collect.

    Reference anchor: the reference has no CV machinery (its queries
    are exploratory aggregates, exploration_summary.md); this extends
    the split family a training pipeline needs over the same tables.
    """
    events = load_table(spark, sf_dir, "events")
    fold = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 3), 16, 10
        ).cast("long")
        % O13_FOLDS
    ).cast("int")
    per_user = (
        events.select(F.col("user_id"), fold.alias("fold"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("fold").alias("n_folds_seen"),
            F.min("fold").alias("fold"),
        )
    )
    per_fold = per_user.groupBy("fold").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.sum((F.col("n_folds_seen") > 1).cast("long"))
        .cast("long")
        .alias("cross_fold_users"),
    )
    total = per_fold.agg(F.sum("n_rows").cast("long").alias("__total"))
    return (
        per_fold.crossJoin(F.broadcast(total))
        # integer basis points — (10000·a) DIV b — per the module
        # header's float-rounding convention
        .withColumn(
            "row_share_bp",
            F.expr("CAST((10000 * n_rows) DIV __total AS BIGINT)"),
        )
        .orderBy("fold")
        .select(
            "fold", "n_users", "n_rows", "cross_fold_users", "row_share_bp"
        )
    )


#: o14 walk-forward geometry (day offsets from the observed minimum):
#: fold k ∈ 1..FOLDS trains on offsets [0, BASE + (k−1)·STEP) and
#: tests on the HORIZON days starting EMBARGO after the train end.
O14_FOLDS = 4
O14_BASE_DAYS = 10
O14_STEP_DAYS = 4
O14_EMBARGO_DAYS = 1
O14_HORIZON_DAYS = 3


def o14_walk_forward_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O14: WALK-FORWARD (expanding-window) backtest folds — the
    time-series CV design that completes the eval-hygiene family: o8
    splits exchangeable rows by hash, o13 splits by entity, o12 makes
    ONE leakage-safe temporal split; model selection on time-ordered
    data needs K of them, each training strictly on the past and
    testing on a fixed horizon after an embargo gap (sklearn's
    ``TimeSeriesSplit`` with purging — the standard financial-ML
    backtest shape). Fold k trains on day-offsets
    ``[0, BASE + (k−1)·STEP)`` and tests on ``HORIZON`` days starting
    ``EMBARGO`` after the train end; boundaries derive from the data's
    min day, so the design is deterministic on any fixture.

    Per fold the output carries the counts a backtest report needs
    (train/test events and users) plus o12's entity-leakage audit
    (``u_both``, ``leak_bp``) — in a walk-forward split the same user
    recurring across sides is EXPECTED (it is a time split, not an
    entity split); the audit quantifies how much user-level signal a
    per-user model could leak, which decides whether o13's grouped
    folds are needed instead.

    Scale shape: ONE events scan; each row meets the K-row fold spec
    through a BROADCAST range join (no shuffle of events by fold), is
    flagged train/test/neither, and collapses through a per-(fold,
    user) aggregate (map-side combine; output |folds|·|users| rows at
    most) before the K-row rollup. The driver-side min-day collect is
    1 row (the fit-literal discipline).
    """
    events = load_table(spark, sf_dir, "events")
    ev = events.select("user_id", F.to_date("ts").alias("day"))
    d0 = ev.agg(F.min("day").alias("d0")).collect()[0]["d0"]
    spec = spark.createDataFrame(
        [
            (
                k,
                O14_BASE_DAYS + (k - 1) * O14_STEP_DAYS,  # train_days
                O14_BASE_DAYS + (k - 1) * O14_STEP_DAYS + O14_EMBARGO_DAYS,
                O14_BASE_DAYS
                + (k - 1) * O14_STEP_DAYS
                + O14_EMBARGO_DAYS
                + O14_HORIZON_DAYS,
            )
            for k in range(1, O14_FOLDS + 1)
        ],
        "fold int, train_days int, test_start int, test_end int",
    )
    flagged = (
        ev.withColumn("off", F.datediff("day", F.lit(d0)))
        .join(F.broadcast(spec))
        .select(
            "fold",
            "train_days",
            "user_id",
            (F.col("off") < F.col("train_days")).cast("int").alias("is_tr"),
            (
                (F.col("off") >= F.col("test_start"))
                & (F.col("off") < F.col("test_end"))
            )
            .cast("int")
            .alias("is_te"),
        )
        .filter((F.col("is_tr") == 1) | (F.col("is_te") == 1))
    )
    per_user = flagged.groupBy("fold", "train_days", "user_id").agg(
        F.sum("is_tr").alias("n_tr"),
        F.sum("is_te").alias("n_te"),
        F.max("is_tr").alias("in_tr"),
        F.max("is_te").alias("in_te"),
    )
    return (
        per_user.groupBy("fold", "train_days")
        .agg(
            F.sum("n_tr").cast("long").alias("n_train"),
            F.sum("n_te").cast("long").alias("n_test"),
            F.sum("in_tr").cast("long").alias("u_train"),
            F.sum("in_te").cast("long").alias("u_test"),
            F.sum(F.col("in_tr") * F.col("in_te"))
            .cast("long")
            .alias("u_both"),
        )
        .withColumn(
            "leak_bp",
            F.expr(
                "CAST((10000 * u_both) DIV GREATEST(u_test, 1) AS BIGINT)"
            ),
        )
        .select(
            "fold",
            F.col("train_days").cast("long").alias("train_days"),
            "n_train",
            "n_test",
            "u_train",
            "u_test",
            "u_both",
            "leak_bp",
        )
        .orderBy("fold")
    )


#: o11: total sample budget as a corpus fraction — n_total = N DIV 10.
O11_BUDGET_DIV = 10


def _o11_with_ssq(per: DataFrame) -> DataFrame:
    """Attach o11's exact radicand ``ssq = n_docs·syy − sy²`` with the
    2^53 loud-failure guard.

    The ±1-corrected isqrt downstream is exact only while the radicand
    casts to double losslessly (< 2^53); past that the allocation would
    drift silently, so the boundary fails loudly in-plan (ADVICE r11) —
    zero cost on the happy path, no extra action: the CASE rides the
    same |sources|-row projection. The radicand itself is evaluated in
    DECIMAL (ADVICE r12): with ANSI off, BIGINT ``n_docs·syy`` wraps
    past 2^63 — e.g. when ``n_docs·syy`` and ``sy²`` are both huge but
    nearly equal — and a wrapped (possibly negative) value would sail
    under the very comparison the guard exists for. DECIMAL(19,0)
    holds any BIGINT; the product's DECIMAL(38,0) holds any BIGINT²
    (max ~8.5e37 < 1e38), so the decimal path cannot itself overflow.
    The guarded value is cast back to BIGINT, exact because it is
    proven < 2^53. Split out of o11 so the boundary arithmetic is unit-
    testable on crafted moments without synthesizing a 2^53 corpus.
    """
    return (
        per.withColumn(
            "ssq_dec",
            F.expr(
                "CAST(n_docs AS DECIMAL(19,0))"
                " * CAST(syy AS DECIMAL(19,0))"
                " - CAST(sy AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))"
            ),
        )
        .withColumn(
            "ssq",
            F.expr(
                "CASE WHEN ssq_dec >= 9007199254740992"
                " THEN raise_error('o11: N_h*Σy²−(Σy)² ≥ 2^53 — widen"
                " the moments to DECIMAL(38,0) and the isqrt correction"
                " to ±2')"
                " ELSE CAST(ssq_dec AS BIGINT) END"
            ),
        )
        .drop("ssq_dec")
    )


def o11_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O11: variance-optimal (Neyman) stratified sample DESIGN — the
    survey-sampling allocation the o-family was missing: o7 draws
    proportional fractions, o10 draws fixed quotas, o11 computes how
    MANY rows each stratum deserves when the budget is fixed and
    strata differ in spread: n_h ∝ N_h·S_h (bigger allocations to
    strata whose token counts vary more, the minimum-variance design
    for estimating the corpus mean). Output per source: the Neyman
    allocation vs the proportional one and the shift between them —
    the design table a measurement pipeline materializes before o10
    draws the rows.

    Exact-integer arithmetic end to end: N_h²·Var_h = N_h·Σy² − (Σy)²
    is an exact integer, so the Neyman weight N_h·S_h =
    isqrt(N_h·Σy² − (Σy)²) needs no float variance — the float sqrt
    appears only inside an isqrt whose ±1 CASE corrections pin the
    exact floor on both engines (exact while the radicand casts to
    double losslessly, i.e. < 2^53; a 100 TB deployment widens the
    moments to DECIMAL(38,0) and the correction loop to ±2).

    Scale shape: ONE corpus aggregation to per-stratum moments
    (count/sum/sum-of-squares — map-side partial combine, the
    d17/d19 rollup discipline), then every allocation step is window
    math over the \\|sources\\|-row frame. Nothing corpus-sized
    shuffles.
    """
    from .text import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    y = F.size(tokens_col(F.col("text"))).cast("long")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(y).alias("sy"),
        F.sum(y * y).alias("syy"),
    )
    per = _o11_with_ssq(per)
    per = (
        per.withColumn(
            "s0",
            F.expr("CAST(FLOOR(SQRT(CAST(ssq AS DOUBLE))) AS BIGINT)"),
        )
        .withColumn(
            "neyman_w",
            F.expr(
                "s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= ssq THEN 1"
                " ELSE 0 END)"
                " - (CASE WHEN s0 * s0 > ssq THEN 1 ELSE 0 END)"
            ),
        )
    )
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tot = (
        per.withColumn("n_corpus", F.sum("n_docs").over(w))
        .withColumn("w_total", F.sum("neyman_w").over(w))
        .withColumn("n_sample", F.expr(f"n_corpus DIV {O11_BUDGET_DIV}"))
    )
    return (
        tot.select(
            "source",
            "n_docs",
            F.col("sy").alias("raw_tokens"),
            "neyman_w",
            F.expr(
                "least((n_sample * neyman_w) DIV greatest(w_total, 1),"
                " n_docs)"
            ).alias("alloc_neyman"),
            F.expr(
                "(n_sample * n_docs) DIV greatest(n_corpus, 1)"
            ).alias("alloc_prop"),
        )
        .withColumn("shift", F.expr("alloc_neyman - alloc_prop"))
        .orderBy("source")
    )


def o9_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O9: deterministic WEIGHTED sampling — importance sampling for
    data curation (upweight long/high-quality docs) with o8's
    stability guarantee: membership depends only on (doc_id, weight),
    never on partitioning, corpus size, or a random seed. Keep doc i
    iff ``u_i · w_max < w_i · 2^48`` where u_i is the first 48 bits of
    md5(doc_id) as an integer — i.e. keep with probability w_i/w_max,
    ALL-INTEGER (u < 2^48, w ≤ ~10^4 ⇒ both products < 2^62: no
    overflow, no float, both engines exact). Weight = n_chars.

    Scale shape: w_max is one MAX aggregate broadcast back as a 1-row
    join; membership is then a pure projection on the scan; the only
    other shuffle is the bounded per-lang rollup. The oracle rebuilds
    u_i from the same 12 hex chars via an explicit base-16 polynomial
    — literal-identical integer arithmetic.
    """
    docs = load_table(spark, sf_dir, "documents")
    wmax = docs.agg(F.max(F.col("n_chars").cast("long")).alias("__wmax"))
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10
    ).cast("long")
    kept = (
        docs.join(F.broadcast(wmax))
        .withColumn("__u", u)
        .withColumn(
            "__keep",
            F.col("__u") * F.col("__wmax")
            < F.col("n_chars").cast("long") * F.lit(2**48),
        )
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("__keep").cast("long")).alias("n_kept"),
            F.sum(
                F.when(F.col("__keep"), F.col("n_chars").cast("long"))
                .otherwise(F.lit(0))
            ).alias("kept_chars"),
            F.sum(
                F.when(F.col("__keep"), F.col("doc_id")).otherwise(F.lit(0))
            ).alias("id_checksum"),
        )
        .orderBy("lang")
    )


def c9_ts_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9/C10: timestamp min/max + span per event type over the events
    table (epoch-second floor on both engines — Spark timestamps are
    µs, the fixture file is ns; see tables.load_table)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.min("ts").cast("long").alias("first_sec"),
        F.max("ts").cast("long").alias("last_sec"),
        (F.max("ts").cast("long") - F.min("ts").cast("long")).alias("span_sec"),
        F.count(F.lit(1)).alias("cnt"),
    )


def c11_from_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C11: schema'd ``from_json`` — the scale-preferred JSON path
    (parse once into a typed struct; get_json_object re-parses per
    extraction). Joint stats over the parsed field and event payload."""
    e = load_table(spark, sf_dir, "events")
    parsed = e.withColumn(
        "p", F.from_json("props", "k INT")
    )
    return (
        parsed.groupBy((F.col("p.k") % 7).alias("k_mod7"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("p.k").alias("min_k"),
            F.max("p.k").alias("max_k"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4).alias(
                "total_value"
            ),
        )
    )


def a16_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 family completion: arbitrary GROUPING SETS — the report
    shape cube/rollup can't express: per (returnflag, linestatus)
    detail + per-returnflag subtotal + grand total, but deliberately
    NOT per-linestatus (so this is neither a rollup nor a cube). One
    Expand + ONE aggregate pass, vs three scans written naively.
    ``grouping()`` flags disambiguate a NULL key value from a
    subtotal row — emitted per column (0/1 ints) rather than a packed
    grouping_id, whose bit order is engine-specific.
    """
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("a16_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_qty
        FROM a16_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        ORDER BY g_flag, g_status, l_returnflag, l_linestatus
        """
    )


QUERIES = {
    "a12_rollup": a12_rollup,
    "a14_histogram": a14_histogram,
    "a15_exact_quantile_twopass": a15_exact_quantile_twopass,
    "a16_grouping_sets": a16_grouping_sets,
    "a12b_cube": a12b_cube,
    "a13_pivot": a13_pivot,
    "c11_from_json_typed": c11_from_json_typed,
    "o6_systematic_sample": o6_systematic_sample,
    "o7_stratified_sample": o7_stratified_sample,
    "o8_hash_split": o8_hash_split,
    "o12_temporal_embargo_split": o12_temporal_embargo_split,
    "o13_group_kfold_split": o13_group_kfold_split,
    "o14_walk_forward_folds": o14_walk_forward_folds,
    "o9_weighted_sample": o9_weighted_sample,
    "o10_stratified_quota_sample": o10_stratified_quota_sample,
    "o11_neyman_allocation": o11_neyman_allocation,
    "c9_ts_minmax": c9_ts_minmax,
    "f1_like_substring": f1_like_substring,
    "f1b_indexed_substring": f1b_indexed_substring,
    "f1c_index_refresh": f1c_index_refresh,
    "f2_is_not_null": f2_is_not_null,
    "f3_boolean_filter": f3_boolean_filter,
    "f4_conjunctive_filter": f4_conjunctive_filter,
    "g1_glob_read": g1_glob_read,
    "g2_csv_roundtrip": g2_csv_roundtrip,
    "g3_jsonl_roundtrip": g3_jsonl_roundtrip,
    "g4_orc_roundtrip": g4_orc_roundtrip,
    "a1_count_star": a1_count_star,
    "a2_groupby_count": a2_groupby_count,
    "a3_multikey_groupby": a3_multikey_groupby,
    "a4_avg_length": a4_avg_length,
    "a5_numeric_stats": a5_numeric_stats,
    "a5b_approx_stats": a5b_approx_stats,
    "a6_count_distinct": a6_count_distinct,
    "a7_boolean_sum": a7_boolean_sum,
    "a8_null_profile": a8_null_profile,
    "a9_value_counts": a9_value_counts,
    "a10_date_histogram": a10_date_histogram,
    "o2_top_dates": o2_top_dates,
    "o4_peak_day": o4_peak_day,
    "c_scalar_suite": c_scalar_suite,
    "c_json_extract": c_json_extract,
}

ORACLE = {
    "a16_grouping_sets": """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        ORDER BY g_flag, g_status, l_returnflag, l_linestatus
    """,
    "a15_exact_quantile_twopass": """
        WITH v AS (
            SELECT n_chars AS val FROM documents WHERE n_chars IS NOT NULL
        ),
        n AS (SELECT COUNT(*) AS n FROM v),
        r AS (
            SELECT val, row_number() OVER (ORDER BY val) - 1 AS rk FROM v
        ),
        t(q, quantile) AS (VALUES (50, 'p50'), (90, 'p90'), (99, 'p99'))
        SELECT t.quantile, n.n AS n,
               CAST((t.q * (n.n - 1)) // 100 AS BIGINT) AS k_rank,
               r.val AS exact_value
        FROM t CROSS JOIN n
        JOIN r ON r.rk = (t.q * (n.n - 1)) // 100
        ORDER BY t.quantile
    """,
    "c11_from_json_typed": """
        WITH parsed AS (
            SELECT CAST(props->>'$.k' AS INT) AS k, value FROM events
        )
        SELECT k % 7 AS k_mod7, COUNT(*) AS cnt,
               MIN(k) AS min_k, MAX(k) AS max_k,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4)
                   AS total_value
        FROM parsed GROUP BY k % 7
    """,
    "a12_rollup": """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    "a14_histogram": f"""
        SELECT CAST(FLOOR(o_totalprice / {HIST_WIDTH}) AS BIGINT) AS bin,
               COUNT(*) AS n_orders,
               ROUND(AVG(o_totalprice), 4) AS avg_price
        FROM orders GROUP BY bin ORDER BY bin
    """,
    "a12b_cube": """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "a13_pivot": """
        SELECT user_id % 10 AS cohort,
               COUNT(*) FILTER (event_type = 'click') AS "click",
               COUNT(*) FILTER (event_type = 'error') AS "error",
               COUNT(*) FILTER (event_type = 'purchase') AS "purchase",
               COUNT(*) FILTER (event_type = 'signup') AS "signup",
               COUNT(*) FILTER (event_type = 'view') AS "view"
        FROM events GROUP BY cohort ORDER BY cohort
    """,
    "o6_systematic_sample": """
        SELECT COUNT(*) AS sample_rows,
               ROUND(AVG(o_totalprice), 4) AS avg_price,
               MIN(o_orderkey) AS min_key,
               MAX(o_orderkey) AS max_key
        FROM orders WHERE o_orderkey % 20 = 7
    """,
    "o7_stratified_sample": """
        WITH ranked AS (
            SELECT lang, doc_id, n_chars,
                   ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
            FROM documents
        )
        SELECT lang, COUNT(*) AS sample_rows,
               MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
               CAST(SUM(n_chars) AS BIGINT) AS sample_chars
        FROM ranked WHERE (rn - 1) % 10 = 0
        GROUP BY lang ORDER BY lang
    """,
    "o11_neyman_allocation": f"""
        WITH y AS (
            SELECT source,
                   CAST(len(regexp_extract_all(lower(text),
                                               '{TOKEN_PATTERN}'))
                        AS BIGINT) AS y
            FROM documents
        ), per AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(y * y) AS BIGINT) AS syy
            FROM y GROUP BY source
        ), rad AS (
            SELECT source, n_docs, sy,
                   n_docs * syy - sy * sy AS ssq,
                   CAST(FLOOR(SQRT(CAST(n_docs * syy - sy * sy AS DOUBLE)))
                        AS BIGINT) AS s0
            FROM per
        ), wts AS (
            SELECT source, n_docs, sy,
                   s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= ssq THEN 1
                              ELSE 0 END)
                      - (CASE WHEN s0 * s0 > ssq THEN 1 ELSE 0 END)
                       AS neyman_w
            FROM rad
        ), tot AS (
            SELECT *,
                   SUM(n_docs) OVER () AS n_corpus,
                   SUM(neyman_w) OVER () AS w_total,
                   (SUM(n_docs) OVER ()) // {O11_BUDGET_DIV} AS n_sample
            FROM wts
        )
        SELECT source, n_docs,
               sy AS raw_tokens,
               CAST(neyman_w AS BIGINT) AS neyman_w,
               CAST(LEAST((n_sample * neyman_w) // GREATEST(w_total, 1),
                          n_docs) AS BIGINT) AS alloc_neyman,
               CAST((n_sample * n_docs) // GREATEST(n_corpus, 1) AS BIGINT)
                   AS alloc_prop,
               CAST(LEAST((n_sample * neyman_w) // GREATEST(w_total, 1),
                          n_docs)
                    - (n_sample * n_docs) // GREATEST(n_corpus, 1)
                    AS BIGINT) AS shift
        FROM tot ORDER BY source
    """,
    "o10_stratified_quota_sample": f"""
        WITH keyed AS (
            SELECT source, doc_id, n_chars,
                   md5('{O10_SEED}:' || CAST(doc_id AS VARCHAR)) AS skey
            FROM documents
        ), ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY skey)
                       AS rk
            FROM keyed
        )
        SELECT source, CAST(rk AS INT) AS rk, doc_id, n_chars, skey
        FROM ranked WHERE rk <= {O10_QUOTA}
        ORDER BY source, rk
    """,
    "o14_walk_forward_folds": f"""
        WITH ev AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   (SELECT MIN(CAST(ts AS DATE)) FROM events) AS d0
            FROM events
        ), spec AS (
            SELECT k AS fold,
                   {O14_BASE_DAYS} + (k - 1) * {O14_STEP_DAYS} AS train_days,
                   {O14_BASE_DAYS} + (k - 1) * {O14_STEP_DAYS}
                       + {O14_EMBARGO_DAYS} AS test_start,
                   {O14_BASE_DAYS} + (k - 1) * {O14_STEP_DAYS}
                       + {O14_EMBARGO_DAYS} + {O14_HORIZON_DAYS} AS test_end
            FROM (SELECT unnest(range(1, {O14_FOLDS + 1})) AS k)
        ), flagged AS (
            SELECT s.fold, s.train_days, e.user_id,
                   CASE WHEN (e.day - e.d0) < s.train_days
                        THEN 1 ELSE 0 END AS is_tr,
                   CASE WHEN (e.day - e.d0) >= s.test_start
                         AND (e.day - e.d0) < s.test_end
                        THEN 1 ELSE 0 END AS is_te
            FROM ev e CROSS JOIN spec s
        ), pu AS (
            SELECT fold, train_days, user_id,
                   SUM(is_tr) AS n_tr, SUM(is_te) AS n_te,
                   MAX(is_tr) AS in_tr, MAX(is_te) AS in_te
            FROM flagged WHERE is_tr = 1 OR is_te = 1
            GROUP BY 1, 2, 3
        )
        SELECT CAST(fold AS INT) AS fold,
               CAST(train_days AS BIGINT) AS train_days,
               CAST(SUM(n_tr) AS BIGINT) AS n_train,
               CAST(SUM(n_te) AS BIGINT) AS n_test,
               CAST(SUM(in_tr) AS BIGINT) AS u_train,
               CAST(SUM(in_te) AS BIGINT) AS u_test,
               CAST(SUM(in_tr * in_te) AS BIGINT) AS u_both,
               CAST((10000 * SUM(in_tr * in_te))
                    // GREATEST(SUM(in_te), 1) AS BIGINT) AS leak_bp
        FROM pu GROUP BY 1, 2 ORDER BY fold
    """,
    "o13_group_kfold_split": f"""
        WITH pu AS (
            SELECT user_id, COUNT(*) AS n_rows,
                   COUNT(DISTINCT fold) AS n_folds_seen,
                   MIN(fold) AS fold
            FROM (
                SELECT user_id,
                       CAST((
                         (strpos('0123456789abcdef', substring(h, 1, 1)) - 1) * 256
                       + (strpos('0123456789abcdef', substring(h, 2, 1)) - 1) * 16
                       + (strpos('0123456789abcdef', substring(h, 3, 1)) - 1)
                       ) % {O13_FOLDS} AS INT) AS fold
                FROM (SELECT user_id, md5(CAST(user_id AS VARCHAR)) AS h
                      FROM events)
            ) GROUP BY user_id
        ), pf AS (
            SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(SUM(n_rows) AS BIGINT) AS n_rows,
                   CAST(SUM(CASE WHEN n_folds_seen > 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS cross_fold_users
            FROM pu GROUP BY fold
        )
        SELECT fold, n_users, n_rows, cross_fold_users,
               CAST((10000 * n_rows) // (SELECT SUM(n_rows) FROM pf)
                    AS BIGINT) AS row_share_bp
        FROM pf ORDER BY fold
    """,
    "o9_weighted_sample": """
        WITH wm AS (
            SELECT CAST(MAX(n_chars) AS BIGINT) AS wmax FROM documents
        ), k AS (
            SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS w,
                   (SELECT wmax FROM wm) AS wmax,
                   (
                     (strpos('0123456789abcdef', substring(h, 1, 1)) - 1) * 17592186044416
                   + (strpos('0123456789abcdef', substring(h, 2, 1)) - 1) * 1099511627776
                   + (strpos('0123456789abcdef', substring(h, 3, 1)) - 1) * 68719476736
                   + (strpos('0123456789abcdef', substring(h, 4, 1)) - 1) * 4294967296
                   + (strpos('0123456789abcdef', substring(h, 5, 1)) - 1) * 268435456
                   + (strpos('0123456789abcdef', substring(h, 6, 1)) - 1) * 16777216
                   + (strpos('0123456789abcdef', substring(h, 7, 1)) - 1) * 1048576
                   + (strpos('0123456789abcdef', substring(h, 8, 1)) - 1) * 65536
                   + (strpos('0123456789abcdef', substring(h, 9, 1)) - 1) * 4096
                   + (strpos('0123456789abcdef', substring(h, 10, 1)) - 1) * 256
                   + (strpos('0123456789abcdef', substring(h, 11, 1)) - 1) * 16
                   + (strpos('0123456789abcdef', substring(h, 12, 1)) - 1)
                   ) AS u
            FROM (SELECT lang, doc_id, n_chars,
                         md5(CAST(doc_id AS VARCHAR)) AS h
                  FROM documents)
        ), flagged AS (
            SELECT lang, doc_id, w,
                   CASE WHEN u * wmax < w * 281474976710656
                        THEN 1 ELSE 0 END AS keep
            FROM k
        )
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(keep) AS BIGINT) AS n_kept,
               CAST(SUM(CASE WHEN keep = 1 THEN w ELSE 0 END) AS BIGINT)
                   AS kept_chars,
               CAST(SUM(CASE WHEN keep = 1 THEN doc_id ELSE 0 END) AS BIGINT)
                   AS id_checksum
        FROM flagged GROUP BY lang ORDER BY lang
    """,
    "o8_hash_split": """
        SELECT CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'd'
                    THEN 'train' ELSE 'holdout' END AS split,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY 1 ORDER BY split
    """,
    "o12_temporal_embargo_split": f"""
        WITH ev AS (
            SELECT event_type, user_id, CAST(ts AS DATE) AS day,
                   (SELECT MIN(CAST(ts AS DATE)) FROM events) AS d0
            FROM events
        ), flagged AS (
            SELECT event_type, user_id,
                   CASE WHEN day <= d0 + {O12_TRAIN_DAYS - 1}
                        THEN 1 ELSE 0 END AS is_tr,
                   CASE WHEN day > d0 + {O12_TRAIN_DAYS - 1}
                         AND day < d0 + {O12_TRAIN_DAYS + O12_EMBARGO_DAYS}
                        THEN 1 ELSE 0 END AS is_em,
                   CASE WHEN day >= d0 + {O12_TRAIN_DAYS + O12_EMBARGO_DAYS}
                        THEN 1 ELSE 0 END AS is_te
            FROM ev
        ), per_user AS (
            SELECT event_type, user_id,
                   SUM(is_tr) AS n_tr, SUM(is_em) AS n_em,
                   SUM(is_te) AS n_te,
                   MAX(is_tr) AS in_tr, MAX(is_te) AS in_te
            FROM flagged GROUP BY 1, 2
        )
        SELECT event_type,
               CAST(SUM(n_tr) AS BIGINT) AS n_train,
               CAST(SUM(n_em) AS BIGINT) AS n_embargo,
               CAST(SUM(n_te) AS BIGINT) AS n_test,
               CAST(SUM(in_tr) AS BIGINT) AS u_train,
               CAST(SUM(in_te) AS BIGINT) AS u_test,
               CAST(SUM(in_tr * in_te) AS BIGINT) AS u_both,
               CAST((10000 * SUM(in_tr * in_te))
                    // GREATEST(SUM(in_te), 1) AS BIGINT) AS leak_bp
        FROM per_user GROUP BY event_type ORDER BY event_type
    """,
    "c9_ts_minmax": """
        SELECT event_type,
               CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS first_sec,
               CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS last_sec,
               CAST(FLOOR(epoch(MAX(ts))) AS BIGINT)
                 - CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS span_sec,
               COUNT(*) AS cnt
        FROM events GROUP BY event_type
    """,
    "f1_like_substring": """
        SELECT doc_id, lang, n_chars FROM documents
        WHERE text LIKE '%hash%' ORDER BY doc_id LIMIT 10
    """,
    # deliberately f1's plain-scan SQL: hash equality against the
    # index-path Spark result proves index path == scan path
    "f1b_indexed_substring": """
        SELECT doc_id, lang, n_chars FROM documents
        WHERE text LIKE '%hash%' ORDER BY doc_id LIMIT 10
    """,
    # f1c: same full-corpus scan SQL — the refreshed (base ∪ appended
    # delta) index must answer identically to a full rebuild and to
    # the scan; any posting lost or duplicated by the refresh breaks
    # the hash
    "f1c_index_refresh": """
        SELECT doc_id, lang, n_chars FROM documents
        WHERE text LIKE '%hash%' ORDER BY doc_id LIMIT 10
    """,
    "f2_is_not_null": """
        SELECT non_en_lang, COUNT(*) AS cnt FROM (
            SELECT NULLIF(lang, 'en') AS non_en_lang FROM documents
        ) WHERE non_en_lang IS NOT NULL
        GROUP BY non_en_lang ORDER BY non_en_lang
    """,
    "f3_boolean_filter": """
        SELECT COUNT(*) AS cnt FROM lineitem WHERE (l_discount > 0.05) = true
    """,
    "g1_glob_read": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
        FROM documents
    """,
    # g2/g3: the oracle fingerprints the ORIGINAL parquet table — the
    # Spark side fingerprints what came back out of the text-format
    # sink, so a hash match certifies the round trip byte-lossless.
    "g2_csv_roundtrip": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
               CAST(SUM(n_chars) AS BIGINT) AS chars_total,
               CAST(SUM(('0x' || substr(md5(text), 1, 10))::BIGINT) AS BIGINT)
                   AS text_checksum,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
        FROM documents
    """,
    "g3_jsonl_roundtrip": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
               CAST(SUM(n_chars) AS BIGINT) AS chars_total,
               CAST(SUM(('0x' || substr(md5(text), 1, 10))::BIGINT) AS BIGINT)
                   AS text_checksum,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
        FROM documents
    """,
    "g4_orc_roundtrip": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
               CAST(SUM(n_chars) AS BIGINT) AS chars_total,
               CAST(SUM(('0x' || substr(md5(text), 1, 10))::BIGINT) AS BIGINT)
                   AS text_checksum,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
        FROM documents
    """,
    "f4_conjunctive_filter": """
        SELECT COUNT(*) AS cnt,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM lineitem
        WHERE l_returnflag = 'R' AND l_quantity > 30 AND l_extendedprice > 1000
    """,
    "a1_count_star": "SELECT COUNT(*) AS cnt FROM lineitem",
    "a2_groupby_count": """
        SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem
        GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "a3_multikey_groupby": """
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt FROM orders
        GROUP BY o_orderpriority, o_orderstatus
        ORDER BY cnt DESC, o_orderpriority, o_orderstatus LIMIT 5
    """,
    "a4_avg_length": """
        SELECT ROUND(AVG(LENGTH(text)), 4) AS avg_text_len FROM documents
    """,
    "a5_numeric_stats": """
        SELECT ROUND(AVG(l_extendedprice), 4) AS mean_price,
               MEDIAN(l_extendedprice) AS median_price,
               MIN(l_extendedprice) AS min_price,
               MAX(l_extendedprice) AS max_price
        FROM lineitem
    """,
    # a5b: exact columns reproduced; the sketch-vs-exact verdicts are
    # asserted TRUE — a FALSE on either side hash-mismatches the row,
    # making sketch accuracy itself a driver-checkable claim.
    "a5b_approx_stats": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               ROUND(AVG(l_extendedprice), 4) AS mean_price,
               MIN(l_extendedprice) AS min_price,
               MAX(l_extendedprice) AS max_price,
               CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts_exact,
               TRUE AS median_ok,
               TRUE AS distinct_ok
        FROM lineitem
    """,
    "a6_count_distinct": """
        SELECT COUNT(DISTINCT o_custkey) AS n_customers,
               COUNT(DISTINCT o_orderpriority) AS n_priorities
        FROM orders
    """,
    "a7_boolean_sum": """
        SELECT CAST(SUM(CAST(l_discount > 0.05 AS BIGINT)) AS BIGINT) AS n_discounted,
               CAST(SUM(CAST(l_tax = 0 AS BIGINT)) AS BIGINT) AS n_taxfree
        FROM lineitem
    """,
    "a8_null_profile": """
        SELECT CAST(SUM(CAST(doc_id IS NULL AS BIGINT)) AS BIGINT) AS nulls_doc_id,
               CAST(SUM(CAST(text IS NULL AS BIGINT)) AS BIGINT) AS nulls_text,
               CAST(SUM(CAST(lang IS NULL AS BIGINT)) AS BIGINT) AS nulls_lang,
               CAST(SUM(CAST(source IS NULL AS BIGINT)) AS BIGINT) AS nulls_source,
               CAST(SUM(CAST(n_chars IS NULL AS BIGINT)) AS BIGINT) AS nulls_n_chars
        FROM documents
    """,
    "a9_value_counts": """
        SELECT lang, COUNT(*) AS cnt FROM documents
        GROUP BY lang ORDER BY cnt DESC, lang
    """,
    "a10_date_histogram": """
        SELECT CAST(o_orderdate AS DATE) AS order_date, COUNT(*) AS cnt
        FROM orders GROUP BY order_date ORDER BY order_date
    """,
    "o2_top_dates": """
        SELECT CAST(o_orderdate AS DATE) AS order_date, COUNT(*) AS cnt
        FROM orders GROUP BY order_date ORDER BY cnt DESC, order_date LIMIT 5
    """,
    "o4_peak_day": """
        SELECT CAST(o_orderdate AS DATE) AS order_date, COUNT(*) AS cnt
        FROM orders GROUP BY order_date ORDER BY cnt DESC, order_date LIMIT 1
    """,
    "c_scalar_suite": """
        SELECT p_partkey,
               LENGTH(p_name) AS name_len,
               (p_name LIKE '%red%') AS is_red,
               p_brand || '/' || p_type AS brand_type,
               SPLIT_PART(p_brand, '#', 1) AS brand_prefix,
               UPPER(p_type) AS type_upper,
               (p_name LIKE 'small%') AS is_small_name,
               REGEXP_FULL_MATCH(p_name, '[a-z]+ (ring|bolt)') AS matches_pattern,
               CAST(CAST(p_retailprice * 1.1 AS DECIMAL(18,2)) AS DOUBLE) AS taxed_price
        FROM part ORDER BY p_partkey LIMIT 50
    """,
    "c_json_extract": """
        SELECT k % 10 AS k_mod, COUNT(*) AS cnt, ROUND(AVG(value), 4) AS avg_value
        FROM (SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k, value
              FROM events)
        GROUP BY k_mod ORDER BY k_mod
    """,
}
