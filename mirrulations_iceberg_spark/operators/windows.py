"""Window functions (SURVEY §2.7 — a [gap] in the reference).

The reference's only argmax ("peak day", demo_optimized_data.py:77-78) is
sort+limit; these queries add the window-function formulations needed by
the north-star workload (dedup-rank, sessionization, per-entity top-N).

Scale stance: a window partitioned by a key is ONE hash shuffle on that
key followed by a per-partition sort — no global sort. Unbounded frames
(`rowsBetween(unboundedPreceding, currentRow)`) run in a single streaming
pass per partition. Skewed partition keys (one user with millions of
events) are the risk at 100 TB; sessionization caps frame state, and AQE
cannot split a window partition — so keys chosen here (custkey, user_id,
nation) are bounded-cardinality-per-key by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table
from .util import materialize_release


def w1_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number top-N per group: each customer's single largest order.
    The window formulation of the reference's sort+limit argmax."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


def w2_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum per user over event time (rows-unbounded frame —
    single streaming pass per partition)."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        events.select(
            "user_id",
            "event_id",
            F.round(F.sum("value").over(w), 4).alias("running_value"),
        )
    )


def w3_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag(): inter-event gap seconds per user — the building block of
    sessionization (gap > threshold ⇒ new session)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select(
            "user_id",
            "event_id",
            (
                F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
            ).alias("gap_sec"),
        )
    )


def w4_rank_in_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank: top-3 customers by balance within each nation. Rank is
    value-determined, so ties resolve identically in both engines."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"))
    return (
        customer.withColumn("rnk", F.dense_rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rnk")
        .orderBy("c_nationkey", "rnk", "c_custkey")
    )


def w5_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via windows: new session when gap > 30 min; then
    per-session stats. Two windows over the SAME (user_id, ts) ordering —
    Catalyst plans one exchange + one sort, the second window reuses
    them (verify with .explain: a single Exchange)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    sess = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
    )


def w6_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """w5's semantics via the built-in ``session_window`` (gap-merge
    aggregation): one shuffle on user_id, no per-row window state. The
    oracle is the hand-rolled LAG/SUM sessionization — the two
    formulations must agree row-for-row."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.col("user_id"), F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select("user_id", "n_events", "session_value")
    )


def w7_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(): decile assignment by order value — the spend-band
    bucketing a pipeline uses for stratified reporting.

    A bare ``NTILE(10) OVER (ORDER BY ...)`` forces every row through
    ONE task (Exchange SinglePartition) — the one shape that simply
    stops at 100 TB. This computes the identical result with a
    distributed two-phase global rank (the ``zipWithIndex`` pattern):

    1. ``repartitionByRange`` on the ordering key — a range shuffle,
       every partition sorted *between* partitions;
    2. per-partition ``row_number`` (window partitioned by
       ``spark_partition_id`` — parallel, no global sort) plus a
       broadcast prefix-sum of partition counts gives the exact global
       rank;
    3. NTILE's bucket is then closed-form in (rank, N): the first
       ``N % 10`` tiles take ``N // 10 + 1`` rows, the rest ``N // 10``.

    The per-partition counts collect is bounded (one long per shuffle
    partition). The ordering key (o_totalprice, o_orderkey) is unique,
    so ranks — and the tie-free decile boundaries — are deterministic.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderkey"
    )
    n_part = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1)
    ranged = (
        orders.repartitionByRange(n_part, "o_totalprice", "o_orderkey")
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    counts = ranged.groupBy("__pid").count().collect()
    offsets, acc = {}, 0
    for row in sorted(counts, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = acc
        acc += row["count"]
    n_total = acc
    offset_df = F.broadcast(
        spark.createDataFrame(
            [(pid, off) for pid, off in offsets.items()], "__pid int, __offset long"
        )
    )
    w = Window.partitionBy("__pid").orderBy("o_totalprice", "o_orderkey")
    base, rem = divmod(n_total, 10)
    head = rem * (base + 1)  # rows covered by the base+1-sized tiles
    ranked = (
        ranged.withColumn("__rn", F.row_number().over(w))
        .join(offset_df, "__pid")
        .withColumn("__rank", F.col("__offset") + F.col("__rn"))
        .withColumn(
            # Integer DIV keeps the bucket math exact at any N (no
            # double rounding near tile boundaries).
            "decile",
            F.when(
                F.col("__rank") <= F.lit(head),
                F.expr(f"(__rank - 1) DIV {base + 1}"),
            ).otherwise(
                F.expr(f"{rem} + (__rank - {head} - 1) DIV {max(base, 1)}")
            )
            + F.lit(1).cast("long"),
        )
    )
    out = (
        ranked.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 4).alias("lo"),
            F.round(F.max("o_totalprice"), 4).alias("hi"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("band_total"),
        )
        .orderBy("decile")
    )
    # 10 bounded rows out; release the range-shuffled cache with them.
    from .util import materialize_release

    return materialize_release(spark, out, ranged)


#: Shared decay constant — spelled as an exact double literal on BOTH
#: engines so the weight arithmetic is identical expression-for-
#: expression (see the w8 docstring for the cross-engine FP argument).
LN2 = 0.6931471805599453
W8_HALF_LIFE_S = 3600.0


def w8_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential time-decayed engagement per user — each event's
    value weighted by exp(-ln2·Δt/half_life) where Δt is the gap to
    the user's LAST event: the recency-weighted activity score feature
    pipelines attach to entities (an EWMA whose closed form needs no
    sequential recursion, so it distributes).

    Scale shape: one hash shuffle on user_id serves both the
    partition-max window (no ordering — whole-partition frame) and the
    final aggregation; nothing is globally sorted and per-user state
    is O(1).

    Cross-engine exactness: Δt is exact integer micros on both
    engines; the weight is double arithmetic with the same literal
    constants (JVM vs libm exp may differ in the last ulp); each term
    is then quantized to DECIMAL(20,10) — far above ulp noise, far
    below the output rounding — so the SUM is order-independent and
    the final ROUND(...,4) hash-matches.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    dt_s = (
        F.unix_micros(F.max("ts").over(w)) - F.unix_micros("ts")
    ) / F.lit(1e6)
    weight = F.exp(F.lit(-LN2) * dt_s / F.lit(W8_HALF_LIFE_S))
    return (
        events.select(
            "user_id",
            (F.col("value") * weight).cast("decimal(20,10)").alias("__term"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("__term").cast("double"), 4).alias("decayed_value"),
        )
    )


def w9_users_to_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day — the growth metric every
    dashboard wants, and the canonical trap query: a naive
    ``COUNT(DISTINCT user) OVER (ORDER BY day)`` needs the full user
    set as window state and re-counts it per row.

    Distributed shape instead: distinct-to-date(d) = |{users whose
    FIRST event day ≤ d}|. Two hash aggregations (per-day activity,
    per-user min-day → new-user counts) and one running sum over the
    day-level rollup. The only unpartitioned window runs on rows
    bounded by DISTINCT DAYS (~3.6K rows for a decade — metadata-sized
    at any corpus scale), never on events; both event-sized
    aggregations are plain map-side-partial hash aggs on day/user_id.
    """
    events = load_table(spark, sf_dir, "events")
    day = F.to_date("ts").alias("day")
    daily = events.groupBy(day).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("users_active"),
    )
    new_users = (
        events.groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("new_users"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.join(new_users, "day", "left")
        .select(
            "day",
            "n_events",
            "users_active",
            F.coalesce("new_users", F.lit(0)).alias("new_users"),
        )
        .withColumn("users_to_date", F.sum("new_users").over(w))
        .orderBy("day")
    )


#: w13: the A→B-without-C pattern (error between view and purchase
#: voids the conversion) and its time horizon.
W13_START, W13_GOAL, W13_VETO = "view", "purchase", "error"
W13_HORIZON_HOURS = 6


def w13_sequence_with_negation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence pattern WITH NEGATION — the MATCH_RECOGNIZE shape w11
    can't express: users whose earliest ``view`` is followed by a
    ``purchase`` within H hours with NO ``error`` event strictly
    between the two. Negation is what separates a real funnel engine
    from an existence test: 'converted' and 'converted cleanly' differ
    exactly by the vetoed set, and both numbers are reported.

    Distributed shape: three per-user sequential-min/exists
    aggregations, every join and rollup keyed on ``user_id`` (the
    start-event min, the goal join against it, one EXISTS semi-join of
    veto events into the (start, goal) interval). No window over raw
    events, per-user state is two timestamps; output is ONE summary
    row. Rates are integer basis points with explicit zero guards
    (ANSI DIV 0 throws where DuckDB's ``//`` returns NULL).
    """
    ev = load_table(spark, sf_dir, "events")
    horizon = F.expr(f"INTERVAL {W13_HORIZON_HOURS} HOURS")
    starts = (
        ev.filter(F.col("event_type") == W13_START)
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_a"))
    )
    goals = (
        ev.filter(F.col("event_type") == W13_GOAL)
        .select("user_id", "ts")
        .join(starts, "user_id")
        .filter((F.col("ts") > F.col("t_a")) & (F.col("ts") <= F.col("t_a") + horizon))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_b"), F.min("t_a").alias("t_a"))
    )
    vetoed = (
        ev.filter(F.col("event_type") == W13_VETO)
        .select("user_id", F.col("ts").alias("t_c"))
        .join(goals, "user_id")
        .filter((F.col("t_c") > F.col("t_a")) & (F.col("t_c") < F.col("t_b")))
        .select("user_id")
        .distinct()
    )
    n_start = starts.agg(F.count(F.lit(1)).alias("n")).withColumnRenamed("n", "n_start")
    n_seq = goals.agg(F.count(F.lit(1)).alias("n")).withColumnRenamed("n", "n_seq")
    n_veto = vetoed.agg(F.count(F.lit(1)).alias("n")).withColumnRenamed("n", "n_vetoed")
    return (
        n_start.join(n_seq)
        .join(n_veto)
        .select(
            "n_start",
            "n_seq",
            "n_vetoed",
            (F.col("n_seq") - F.col("n_vetoed")).alias("n_clean"),
            F.expr(
                "CAST(CASE WHEN n_start = 0 THEN 0"
                " ELSE (10000 * (n_seq - n_vetoed)) DIV n_start END AS BIGINT)"
            ).alias("clean_conv_bp"),
            F.expr(
                "CAST(CASE WHEN n_seq = 0 THEN 0"
                " ELSE (10000 * n_vetoed) DIV n_seq END AS BIGINT)"
            ).alias("veto_rate_bp"),
        )
    )


def w12_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohort matrix — the second canonical
    product-analytics question after w11's funnel: of the users whose
    FIRST activity fell in week W (the cohort), how many were active
    again k weeks later? Output is one row per (cohort_week,
    week_offset) with the active count, the cohort's size, and
    retention in integer basis points.

    Distributed shape: the cohort assignment is one per-user min
    aggregation (shuffle on user_id); activity reduces to DISTINCT
    (user, week) BEFORE the cohort join — so the join input is
    users×weeks-active, not raw events — and the join itself is
    user_id-keyed (co-partitioned with the aggregation's exchange
    under AQE). The matrix is |weeks|² rows — metadata-sized at any
    corpus scale (a decade of weekly cohorts is ~520×520). Offsets are
    exact integer day arithmetic / 7 (weeks both start Monday on both
    engines); retention is ``(10000 * n) DIV size`` — no floats.
    """
    events = load_table(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    user_weeks = events.select("user_id", week).distinct()
    cohorts = user_weeks.groupBy("user_id").agg(
        F.min("week").alias("cohort_week")
    )
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        user_weeks.join(cohorts, "user_id")
        .withColumn(
            "week_offset",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7).cast("int"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(sizes, "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "cohort_size",
            F.expr("(10000 * n_active) DIV cohort_size").alias(
                "retention_bp"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


W14_BUCKET_S = 900  # 15-minute downsample buckets


def w14_gapfill_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style downsample with gap-fill + last-observation
    carry-forward — TimescaleDB's ``time_bucket_gapfill``/``locf``
    re-expressed Spark-first, the continuous-aggregate shape every
    time-series deployment reads instead of raw events. Events bucket
    to 15-minute epochs per event_type; every bucket in each type's
    [min, max] span exists in the output (gaps materialized with
    ``n_events = 0``), and ``locf_sum`` carries the last present
    bucket's value across gaps.

    Distributed shape: the bucket rollup is one map-side-partial
    hash-agg (the only corpus-sized shuffle, keyed on type×bucket);
    the gap grid is ``sequence()``-exploded from a |types|-row span
    aggregate — domain-bounded (types × span/900s), NOT data-bounded —
    and joins the rollup on its own key. The LOCF window partitions by
    event_type ordered by bucket: partition size = span buckets, again
    time-bounded, not row-bounded (a decade of 15-min buckets is
    ~350K rows/type; chunk by calendar month first if types are few
    and spans are decades). Float exactness: per-bucket sums quantize
    ``ROUND(value, 4)`` into DECIMAL(20,4) — order-independent and
    identical cross-engine (the t13 pattern) — and only the final
    columns cast back to double.
    """
    events = load_table(spark, sf_dir, "events")
    per = (
        events.select(
            "event_type",
            F.expr(
                f"(unix_timestamp(ts) DIV {W14_BUCKET_S}) * {W14_BUCKET_S}"
            ).alias("bucket_epoch"),
            F.round(F.col("value"), 4).cast("decimal(20,4)").alias("__v"),
        )
        .groupBy("event_type", "bucket_epoch")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum("__v").alias("__bsum"),
        )
    )
    grid = (
        per.groupBy("event_type")
        .agg(F.min("bucket_epoch").alias("lo"), F.max("bucket_epoch").alias("hi"))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.lit(W14_BUCKET_S).cast("long"))
            ).alias("bucket_epoch"),
        )
    )
    locf_w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_epoch")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(per, ["event_type", "bucket_epoch"], "left")
        .select(
            "event_type",
            "bucket_epoch",
            F.coalesce("__n", F.lit(0)).cast("long").alias("n_events"),
            F.col("__bsum").cast("double").alias("bucket_sum"),
            F.last("__bsum", ignorenulls=True)
            .over(locf_w)
            .cast("double")
            .alias("locf_sum"),
            F.col("__n").isNull().cast("int").alias("is_gap"),
        )
        .orderBy("event_type", "bucket_epoch")
    )


W15_BUCKET_S = 3600  # hourly OHLC candles


def w15_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candle downsample — the other half of the hypertable
    rollup pair with w14 (financial/metrics first-last-min-max per
    bucket): per (event_type, hour) the OPEN (first value by event
    time), CLOSE (last), HIGH, LOW, and event count. First/last are
    exact ``min_by``/``max_by`` picks keyed on a zero-padded
    ``(epoch_micros, event_id)`` string — totally ordered and
    identical cross-engine, so ties in the timestamp (replicated
    ingests) cannot make the two engines pick different rows; high/low
    are exact double min/max. No window function at all: one map-side-
    partial hash-agg is the whole operator, the cheapest shape a
    downsample can have at 100 TB.

    Oracle: DuckDB ``arg_min/arg_max`` over the same string key.
    NULL values are filtered symmetrically on both engines BEFORE the
    candle math (review r9: Spark's ``min_by`` would return a NULL
    value at the extreme key while DuckDB's ``arg_min`` skips NULL
    arguments — the symmetric filter removes that divergence class;
    candles summarize observed values).
    """
    events = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    key = F.concat(
        F.lpad(F.unix_micros(F.col("ts")).cast("string"), 20, "0"),
        F.lit(":"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        events.select(
            "event_type",
            F.expr(
                f"(unix_timestamp(ts) DIV {W15_BUCKET_S}) * {W15_BUCKET_S}"
            ).alias("bucket_epoch"),
            "value",
            key.alias("__k"),
        )
        .groupBy("event_type", "bucket_epoch")
        .agg(
            F.min_by("value", F.col("__k")).alias("open"),
            F.max_by("value", F.col("__k")).alias("close"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type", "bucket_epoch")
    )


W10_WINDOW_S = 3600  # trailing time window (seconds)


def w10_trailing_window_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: trailing-hour event count and value sum per
    user at every event — the time-windowed feature a ROWS frame can't
    express (the frame is defined by timestamp VALUE, so simultaneous
    events are peers regardless of position; w2's rows-frame is the
    positional cousin).

    Same shuffle shape as every partitioned window (one hash exchange
    on user_id + per-partition sort); frame state is bounded by an
    hour's events per user. Cross-engine exactness: the frame SET is
    value-determined (identical in both engines — no tie ambiguity),
    and the summed terms are quantized to DECIMAL(18,6) so the
    sliding-frame arithmetic (add/retract order differs by engine) is
    exact and order-free; one ROUND at the end.
    """
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-W10_WINDOW_S * 1_000_000, 0)
    )
    return events.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("trailing_1h_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double"),
            4,
        ).alias("trailing_1h_value"),
    )


FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_HORIZON_HOURS = 6  # step k+1 must land within this window of step k


def w11_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis — the MATCH_RECOGNIZE-shaped question
    every product-analytics stack asks: how many users did A, then B
    within H hours after A, then C within H hours after B? Implemented
    as an iterated key-local sequential-min: step 1 is the earliest
    'view' per user; step k+1 is the earliest step-(k+1) event
    strictly after the user's step-k time and inside the horizon. A
    user converts through the funnel iff all three sequential minima
    exist — earliest-first is the standard (and deterministic)
    attribution rule, and the horizon is what makes a funnel a funnel
    rather than an existence test (on the fixture: 150 → 19 → 1 users
    at 6 h, vs 100% conversion unbounded).

    Scale shape: every join and aggregate keys on ``user_id`` — the
    per-step event subsets each shuffle once (filter pushed to the
    scan), then join co-partitioned against the previous step's
    user-level row. Each step's user/t_prev table is consumed TWICE
    (its own count aggregate + the next step's join input), so it is
    cached after its aggregate — without the cache the lazy union
    replays earlier steps' scans/joins ~O(steps^2) times. The caches
    are released before return via ``materialize_release`` (output is
    bounded at |steps| rows). Conversion rates are integer basis
    points (DIV — exact on both engines); the 3-row assembly's
    ordering window is bounded by the step count, never by data.
    """
    ev = load_table(spark, sf_dir, "events")
    steps = []
    cached = []
    prev = None
    for i, name in enumerate(FUNNEL_STEPS):
        cur = ev.filter(F.col("event_type") == name).select("user_id", "ts")
        if prev is not None:
            cur = cur.join(prev, "user_id").filter(
                (F.col("ts") > F.col("t_prev"))
                & (
                    F.col("ts")
                    <= F.col("t_prev")
                    + F.expr(f"INTERVAL {FUNNEL_HORIZON_HOURS} HOURS")
                )
            )
        cur = cur.groupBy("user_id").agg(F.min("ts").alias("t_prev")).cache()
        cached.append(cur)
        steps.append(
            cur.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i + 1).alias("step"),
                F.lit(name).alias("event_type"),
                "n_users",
            )
        )
        prev = cur
    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    w = Window.orderBy("step")  # |FUNNEL_STEPS| rows — bounded
    result = (
        out.withColumn("n_prev", F.lag("n_users").over(w))
        .select(
            "step",
            "event_type",
            "n_users",
            # n_prev = 0 guard: a dead step converts nobody (and ANSI
            # DIV 0 would throw where DuckDB's // returns NULL)
            F.expr(
                "CAST(CASE WHEN n_prev IS NULL THEN 10000 "
                "WHEN n_prev = 0 THEN 0 "
                "ELSE (10000 * n_users) DIV n_prev END AS BIGINT)"
            ).alias("conv_from_prev_bp"),
        )
        .orderBy("step")
    )
    return materialize_release(spark, result, *cached)


W16_TRAIN_DAYS = 14  # baseline window: first N days per event_type
W16_H = 4  # decision interval: flag when CUSUM exceeds H·sigma


def w16_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM changepoint detection over daily event volumes —
    the ingest-monitoring operator a 100 TB pipeline runs on every
    source feed (Page 1954; the classic mean-shift detector): per
    ``event_type``, a baseline mean/σ from the first
    ``W16_TRAIN_DAYS`` days, then cumulative-sum drift statistics over
    the monitored days with flags where the statistic crosses
    ``W16_H·σ``.

    The CUSUM recursion ``S_t = max(0, S_{t-1} + d_t)`` is not a
    window function, but its closed form is: with prefix sums
    ``P_t = Σ_{j≤t} d_j`` and ``P_0 = 0``,
    ``S_t = P_t − min(0, min_{j≤t} P_j)`` — one running SUM plus one
    running MIN per side, both plain cumulative windows, so the whole
    detector stays declarative in BOTH engines (no recursion, no UDF,
    no iteration).

    Exact integer arithmetic end to end: every deviation is scaled by
    ``2·n_train`` — ``d⁺ = 2n·x − 2·Σx_train − σ_n`` is
    ``2n·(x − μ − σ/2)`` (the textbook k = σ/2 slack) with
    ``σ_n = n·σ = isqrt(n·Σx² − (Σx)²)`` the o11 exact-isqrt pattern
    (±1-corrected floor; the radicand is evaluated in DECIMAL and
    guarded < 2^53 so a count scale that would silently degrade the
    floor fails loudly instead — at 100 TB daily volumes, widen the
    moments to DECIMAL(38,0)). The flag threshold ``H·σ`` lands in the
    same scale as ``2·H·σ_n``. No floats anywhere.

    Scale shape: ONE events scan to (type, day) counts — map-side
    partial combine, the m14-drift rollup discipline — then every
    window runs over the |types|·|days| design table. Nothing
    event-sized shuffles; the monitored output is |types|·(days −
    train) rows.
    """
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return w16_detect(daily)


def w16_detect(daily: DataFrame) -> DataFrame:
    """w16's detector over ANY (event_type, day, n_events) table — the
    post-rollup window algebra, shared with s8's streamed rollup (the
    d10/s6 pattern: one algorithm, batch and streaming feeders, one
    oracle proving parity)."""
    wday = Window.partitionBy("event_type").orderBy("day")
    ranked = daily.withColumn("dn", F.row_number().over(wday))
    # Train moments as whole-partition windows over the SAME ranked
    # lineage (review r13: a groupBy-train + join-back recomputed the
    # daily rollup — two events scans; the conditional windows share
    # wday's partitioning, so this stays ONE scan, one exchange, and
    # the design table never leaves its partition).
    wall = Window.partitionBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    in_train = F.col("dn") <= W16_TRAIN_DAYS
    with_tr = (
        ranked.withColumn(
            "n_train",
            F.sum(F.when(in_train, 1).otherwise(0)).over(wall),
        )
        .withColumn(
            "st", F.sum(F.when(in_train, F.col("n_events"))).over(wall)
        )
        .withColumn(
            "stt",
            F.sum(
                F.when(in_train, F.col("n_events") * F.col("n_events"))
            ).over(wall),
        )
        .withColumn(
            "rad",
            F.expr(
                "CASE WHEN CAST(n_train AS DECIMAL(19,0))"
                " * CAST(stt AS DECIMAL(19,0))"
                " - CAST(st AS DECIMAL(19,0)) * CAST(st AS DECIMAL(19,0))"
                " >= 9007199254740992"
                " THEN raise_error('w16: n·Σx²−(Σx)² ≥ 2^53 — widen the"
                " moments to DECIMAL(38,0)')"
                " ELSE CAST(CAST(n_train AS DECIMAL(19,0))"
                " * CAST(stt AS DECIMAL(19,0))"
                " - CAST(st AS DECIMAL(19,0)) * CAST(st AS DECIMAL(19,0))"
                " AS BIGINT) END"
            ),
        )
        .withColumn(
            "s0", F.expr("CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS BIGINT)")
        )
        .withColumn(
            "sigma_n",
            F.expr(
                "s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= rad THEN 1 ELSE 0"
                " END) - (CASE WHEN s0 * s0 > rad THEN 1 ELSE 0 END)"
            ),
        )
    )
    mon = with_tr.filter(F.col("dn") > W16_TRAIN_DAYS).select(
        "event_type",
        "day",
        "n_events",
        (
            2 * F.col("n_train") * F.col("n_events")
            - 2 * F.col("st")
            - F.col("sigma_n")
        ).alias("dpos"),
        (
            2 * F.col("st")
            - 2 * F.col("n_train") * F.col("n_events")
            - F.col("sigma_n")
        ).alias("dneg"),
        "sigma_n",
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        mon.withColumn("ppos", F.sum("dpos").over(wcum))
        .withColumn("pneg", F.sum("dneg").over(wcum))
        .withColumn(
            "cusum_pos",
            F.col("ppos") - F.least(F.lit(0), F.min("ppos").over(wcum)),
        )
        .withColumn(
            "cusum_neg",
            F.col("pneg") - F.least(F.lit(0), F.min("pneg").over(wcum)),
        )
        .withColumn("threshold", 2 * F.lit(W16_H) * F.col("sigma_n"))
    )
    return cum.select(
        "event_type",
        "day",
        "n_events",
        F.col("cusum_pos").cast("long").alias("cusum_pos"),
        F.col("cusum_neg").cast("long").alias("cusum_neg"),
        F.col("threshold").cast("long").alias("threshold"),
        F.expr(
            "CAST(CASE WHEN cusum_pos > threshold THEN 1 ELSE 0 END"
            " AS BIGINT)"
        ).alias("flag_up"),
        F.expr(
            "CAST(CASE WHEN cusum_neg > threshold THEN 1 ELSE 0 END"
            " AS BIGINT)"
        ).alias("flag_down"),
    ).orderBy("event_type", "day")


W17_TRAIN_DAYS = 21  # 3 ISO weeks: every day-of-week gets 3 baseline samples
W17_K = 3  # flag when |x − median| > K·MAD (robust z-score > K)


def w17_seasonal_robust_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware robust anomaly detection over daily event
    volumes — w16's CUSUM flags sustained mean SHIFTS; this flags
    single-day OUTLIERS against a day-of-week baseline (weekend dips
    are not anomalies; a Tuesday at Saturday volume is). Per
    ``(event_type, iso_dow)``: baseline median and MAD (median absolute
    deviation — the robust σ that one historic outlier can't inflate,
    which is the point: a mean/σ baseline trained on data containing
    the very anomalies you hunt is self-blinding) over the first
    ``W17_TRAIN_DAYS`` observed days, then each later day flags when
    ``|x − med| > K·MAD``.

    Exact integer algebra end to end — the w16 discipline, adapted to
    medians: both engines interpolate the even-count median to a
    half-integer, so ``med2 = 2·median(n)`` and ``mad4 = 2·median(2·|2n
    − med2|/2) = 2·median(dev2)`` are exact BIGINTs (a ×2-scaled
    integer median is a+b — exactly representable, no float drift),
    and the flag is the pure integer comparison ``2·dev2 > K·mad4`` ≡
    ``|x − med| > K·MAD``. MAD = 0 (constant baseline) flags any
    deviation — correct for a flat feed, and the strict ``>`` keeps an
    exactly-on-baseline day quiet.

    Scale shape: ONE events scan → (type, day) map-side-combined
    counts; everything after runs on the |types|·|days| design table —
    one exchange for the per-type day rank, one for the (type, dow)
    cells, with both medians (conditional, null-skipping) as
    whole-partition window aggregates over the SAME cell partitioning
    (no join-back, no second scan — the w16 review lesson). Monitored
    days whose (type, dow) cell has no baseline row are dropped (with
    contiguous feeds and TRAIN a multiple of 7 the cell is never
    empty; a production gap-y feed would LEFT-join a calendar spine
    first — w14's gap-fill is that operator).

    Cross-engine parity notes: Spark ``weekday(day)+1`` == DuckDB
    ``isodow(day)`` (Mon=1…Sun=7), and Spark ``percentile(x, 0.5)``
    == DuckDB ``median(x)`` (both exact-interpolating, both
    null-skipping over the CASE-gated train rows; verified on even
    and odd counts).
    """
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    wday = Window.partitionBy("event_type").orderBy("day")
    ranked = daily.withColumn("dn", F.row_number().over(wday)).withColumn(
        "dow", F.expr("CAST(weekday(day) + 1 AS BIGINT)")
    )
    wcell = Window.partitionBy("event_type", "dow")
    med2 = (
        (
            F.lit(2)
            * F.expr(
                f"percentile(CASE WHEN dn <= {W17_TRAIN_DAYS}"
                " THEN n_events END, 0.5)"
            ).over(wcell)
        )
        .cast("long")
        .alias("med2")
    )
    base = ranked.select("*", med2).withColumn(
        "dev2_tr",
        F.when(
            F.col("dn") <= W17_TRAIN_DAYS,
            F.abs(2 * F.col("n_events") - F.col("med2")),
        ),
    )
    mad4 = (
        (F.lit(2) * F.expr("percentile(dev2_tr, 0.5)").over(wcell))
        .cast("long")
        .alias("mad4")
    )
    scored = base.select("*", mad4)
    return (
        scored.filter(
            (F.col("dn") > W17_TRAIN_DAYS) & F.col("med2").isNotNull()
        )
        .select(
            "event_type",
            "day",
            "dow",
            "n_events",
            "med2",
            "mad4",
            F.abs(2 * F.col("n_events") - F.col("med2")).alias("dev2"),
            F.expr(
                f"CAST(CASE WHEN 2 * abs(2 * n_events - med2)"
                f" > {W17_K} * mad4 THEN 1 ELSE 0 END AS BIGINT)"
            ).alias("flag"),
        )
        .orderBy("event_type", "day")
    )


QUERIES = {
    "w1_topn_per_group": w1_topn_per_group,
    "w16_cusum_changepoint": w16_cusum_changepoint,
    "w17_seasonal_robust_anomaly": w17_seasonal_robust_anomaly,
    "w11_funnel_steps": w11_funnel_steps,
    "w12_retention_cohorts": w12_retention_cohorts,
    "w13_sequence_with_negation": w13_sequence_with_negation,
    "w14_gapfill_downsample": w14_gapfill_downsample,
    "w15_ohlc_downsample": w15_ohlc_downsample,
    "w2_running_sum": w2_running_sum,
    "w3_lag_delta": w3_lag_delta,
    "w4_rank_in_partition": w4_rank_in_partition,
    "w5_sessionize": w5_sessionize,
    "w6_session_window": w6_session_window,
    "w7_ntile_deciles": w7_ntile_deciles,
    "w8_decayed_engagement": w8_decayed_engagement,
    "w9_users_to_date": w9_users_to_date,
    "w10_trailing_window_value": w10_trailing_window_value,
}

ORACLE = {
    "w17_seasonal_robust_anomaly": f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1, 2
        ), ranked AS (
            SELECT *, row_number() OVER (PARTITION BY event_type
                                         ORDER BY day) AS dn,
                   CAST(isodow(day) AS BIGINT) AS dow
            FROM daily
        ), base AS (
            SELECT *,
                   CAST(2 * median(CASE WHEN dn <= {W17_TRAIN_DAYS}
                                        THEN n_events END)
                            OVER (PARTITION BY event_type, dow)
                        AS BIGINT) AS med2
            FROM ranked
        ), dev AS (
            SELECT *, CASE WHEN dn <= {W17_TRAIN_DAYS}
                           THEN abs(2 * n_events - med2) END AS dev2_tr
            FROM base
        ), madded AS (
            SELECT *,
                   CAST(2 * median(dev2_tr)
                            OVER (PARTITION BY event_type, dow)
                        AS BIGINT) AS mad4
            FROM dev
        )
        SELECT event_type, day, dow, n_events, med2, mad4,
               abs(2 * n_events - med2) AS dev2,
               CAST(CASE WHEN 2 * abs(2 * n_events - med2)
                              > {W17_K} * mad4 THEN 1 ELSE 0 END
                    AS BIGINT) AS flag
        FROM madded
        WHERE dn > {W17_TRAIN_DAYS} AND med2 IS NOT NULL
        ORDER BY event_type, day
    """,
    "w16_cusum_changepoint": f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1, 2
        ), ranked AS (
            SELECT *, row_number() OVER (PARTITION BY event_type
                                         ORDER BY day) AS dn
            FROM daily
        ), train AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_train,
                   CAST(SUM(n_events) AS BIGINT) AS st,
                   CAST(SUM(n_events * n_events) AS BIGINT) AS stt
            FROM ranked WHERE dn <= {W16_TRAIN_DAYS} GROUP BY 1
        ), sig AS (
            SELECT event_type, n_train, st,
                   s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= rad THEN 1
                              ELSE 0 END)
                      - (CASE WHEN s0 * s0 > rad THEN 1 ELSE 0 END)
                       AS sigma_n
            FROM (
                SELECT *, n_train * stt - st * st AS rad,
                       CAST(FLOOR(SQRT(CAST(n_train * stt - st * st
                                            AS DOUBLE))) AS BIGINT) AS s0
                FROM train
            )
        ), mon AS (
            SELECT r.event_type, r.day, r.n_events,
                   2 * s.n_train * r.n_events - 2 * s.st - s.sigma_n
                       AS dpos,
                   2 * s.st - 2 * s.n_train * r.n_events - s.sigma_n
                       AS dneg,
                   s.sigma_n
            FROM ranked r JOIN sig s USING (event_type)
            WHERE r.dn > {W16_TRAIN_DAYS}
        ), pre AS (
            SELECT *,
                   SUM(dpos) OVER (PARTITION BY event_type ORDER BY day
                                   ROWS UNBOUNDED PRECEDING) AS ppos,
                   SUM(dneg) OVER (PARTITION BY event_type ORDER BY day
                                   ROWS UNBOUNDED PRECEDING) AS pneg
            FROM mon
        ), cum AS (
            SELECT *,
                   ppos - LEAST(0, MIN(ppos) OVER (PARTITION BY event_type
                                                   ORDER BY day
                                                   ROWS UNBOUNDED PRECEDING))
                       AS cusum_pos,
                   pneg - LEAST(0, MIN(pneg) OVER (PARTITION BY event_type
                                                   ORDER BY day
                                                   ROWS UNBOUNDED PRECEDING))
                       AS cusum_neg,
                   2 * {W16_H} * sigma_n AS threshold
            FROM pre
        )
        SELECT event_type, day, n_events,
               CAST(cusum_pos AS BIGINT) AS cusum_pos,
               CAST(cusum_neg AS BIGINT) AS cusum_neg,
               CAST(threshold AS BIGINT) AS threshold,
               CAST(CASE WHEN cusum_pos > threshold THEN 1 ELSE 0 END
                    AS BIGINT) AS flag_up,
               CAST(CASE WHEN cusum_neg > threshold THEN 1 ELSE 0 END
                    AS BIGINT) AS flag_down
        FROM cum ORDER BY event_type, day
    """,
    "w15_ohlc_downsample": f"""
        WITH e AS (
            SELECT event_type,
                   (epoch_us(ts) // 1000000 // {W15_BUCKET_S})
                       * {W15_BUCKET_S} AS bucket_epoch,
                   value,
                   lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || ':' ||
                   lpad(CAST(event_id AS VARCHAR), 12, '0') AS k
            FROM events WHERE value IS NOT NULL
        )
        SELECT event_type,
               CAST(bucket_epoch AS BIGINT) AS bucket_epoch,
               arg_min(value, k) AS open,
               arg_max(value, k) AS close,
               MAX(value) AS high,
               MIN(value) AS low,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM e GROUP BY 1, 2 ORDER BY event_type, bucket_epoch
    """,
    "w14_gapfill_downsample": f"""
        WITH per AS (
            SELECT event_type,
                   (epoch_us(ts) // 1000000 // {W14_BUCKET_S})
                       * {W14_BUCKET_S} AS bucket_epoch,
                   COUNT(*) AS n,
                   SUM(CAST(ROUND(value, 4) AS DECIMAL(20,4))) AS bsum
            FROM events GROUP BY 1, 2
        ), span AS (
            SELECT event_type, MIN(bucket_epoch) AS lo,
                   MAX(bucket_epoch) AS hi
            FROM per GROUP BY 1
        ), grid AS (
            SELECT event_type,
                   unnest(range(lo, hi + {W14_BUCKET_S}, {W14_BUCKET_S}))
                       AS bucket_epoch
            FROM span
        ), f AS (
            SELECT g.event_type, g.bucket_epoch, p.n, p.bsum
            FROM grid g LEFT JOIN per p USING (event_type, bucket_epoch)
        )
        SELECT event_type,
               CAST(bucket_epoch AS BIGINT) AS bucket_epoch,
               CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
               CAST(bsum AS DOUBLE) AS bucket_sum,
               CAST(last_value(bsum IGNORE NULLS) OVER (
                        PARTITION BY event_type ORDER BY bucket_epoch
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS locf_sum,
               CAST(CASE WHEN n IS NULL THEN 1 ELSE 0 END AS INT) AS is_gap
        FROM f ORDER BY event_type, bucket_epoch
    """,
    "w13_sequence_with_negation": f"""
        WITH starts AS (
            SELECT user_id, MIN(ts) AS t_a FROM events
            WHERE event_type = '{W13_START}' GROUP BY user_id
        ), goals AS (
            SELECT e.user_id, MIN(e.ts) AS t_b, MIN(s.t_a) AS t_a
            FROM events e JOIN starts s USING (user_id)
            WHERE e.event_type = '{W13_GOAL}'
              AND e.ts > s.t_a
              AND e.ts <= s.t_a + INTERVAL {W13_HORIZON_HOURS} HOURS
            GROUP BY e.user_id
        ), vetoed AS (
            SELECT DISTINCT e.user_id
            FROM events e JOIN goals g USING (user_id)
            WHERE e.event_type = '{W13_VETO}'
              AND e.ts > g.t_a AND e.ts < g.t_b
        ), c AS (
            SELECT (SELECT COUNT(*) FROM starts) AS n_start,
                   (SELECT COUNT(*) FROM goals) AS n_seq,
                   (SELECT COUNT(*) FROM vetoed) AS n_vetoed
        )
        SELECT n_start, n_seq, n_vetoed,
               n_seq - n_vetoed AS n_clean,
               CAST(CASE WHEN n_start = 0 THEN 0
                    ELSE (10000 * (n_seq - n_vetoed)) // n_start END
                    AS BIGINT) AS clean_conv_bp,
               CAST(CASE WHEN n_seq = 0 THEN 0
                    ELSE (10000 * n_vetoed) // n_seq END
                    AS BIGINT) AS veto_rate_bp
        FROM c
    """,
    "w12_retention_cohorts": """
        WITH uw AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('week', ts) AS DATE) AS week
            FROM events
        ), cohorts AS (
            SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id
        ), sizes AS (
            SELECT cohort_week, COUNT(*) AS cohort_size
            FROM cohorts GROUP BY cohort_week
        ), matrix AS (
            SELECT c.cohort_week,
                   CAST((uw.week - c.cohort_week) // 7 AS INT) AS week_offset,
                   COUNT(*) AS n_active
            FROM uw JOIN cohorts c USING (user_id)
            GROUP BY 1, 2
        )
        SELECT m.cohort_week, m.week_offset, m.n_active, s.cohort_size,
               CAST((10000 * m.n_active) // s.cohort_size AS BIGINT)
                   AS retention_bp
        FROM matrix m JOIN sizes s USING (cohort_week)
        ORDER BY m.cohort_week, m.week_offset
    """,
    "w11_funnel_steps": f"""
        WITH s1 AS (
            SELECT user_id, MIN(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ), s2 AS (
            SELECT e.user_id, MIN(e.ts) AS t2
            FROM events e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click' AND e.ts > s1.t1
              AND e.ts <= s1.t1 + INTERVAL {FUNNEL_HORIZON_HOURS} HOUR
            GROUP BY e.user_id
        ), s3 AS (
            SELECT e.user_id, MIN(e.ts) AS t3
            FROM events e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase' AND e.ts > s2.t2
              AND e.ts <= s2.t2 + INTERVAL {FUNNEL_HORIZON_HOURS} HOUR
            GROUP BY e.user_id
        ), counts AS (
            SELECT 1 AS step, 'view' AS event_type,
                   (SELECT COUNT(*) FROM s1) AS n_users
            UNION ALL
            SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
            UNION ALL
            SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)
        )
        SELECT step, event_type, CAST(n_users AS BIGINT) AS n_users,
               CAST(CASE WHEN lag(n_users) OVER (ORDER BY step) IS NULL
                         THEN 10000
                         WHEN lag(n_users) OVER (ORDER BY step) = 0
                         THEN 0
                         ELSE (10000 * n_users)
                              // lag(n_users) OVER (ORDER BY step)
                    END AS BIGINT) AS conv_from_prev_bp
        FROM counts ORDER BY step
    """,
    "w10_trailing_window_value": f"""
        SELECT user_id, event_id,
               CAST(COUNT(*) OVER w AS BIGINT) AS trailing_1h_events,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE), 4)
                   AS trailing_1h_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000
                     RANGE BETWEEN {W10_WINDOW_S * 1_000_000} PRECEDING
                           AND CURRENT ROW)
    """,
    "w9_users_to_date": """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
                   COUNT(DISTINCT user_id) AS users_active
            FROM events GROUP BY 1
        ), firsts AS (
            SELECT MIN(CAST(ts AS DATE)) AS day FROM events GROUP BY user_id
        ), nu AS (
            SELECT day, COUNT(*) AS new_users FROM firsts GROUP BY day
        )
        SELECT d.day, CAST(d.n_events AS BIGINT) AS n_events,
               CAST(d.users_active AS BIGINT) AS users_active,
               CAST(COALESCE(nu.new_users, 0) AS BIGINT) AS new_users,
               CAST(SUM(COALESCE(nu.new_users, 0)) OVER (
                   ORDER BY d.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS users_to_date
        FROM daily d LEFT JOIN nu USING (day)
        ORDER BY d.day
    """,
    "w8_decayed_engagement": f"""
        WITH t AS (
            SELECT user_id,
                   CAST(value * exp(-{LN2!r} *
                        ((epoch_ns(MAX(ts) OVER (PARTITION BY user_id)) // 1000
                          - epoch_ns(ts) // 1000) / 1e6) / {W8_HALF_LIFE_S!r})
                        AS DECIMAL(20,10)) AS term
            FROM events
        )
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(CAST(SUM(term) AS DOUBLE), 4) AS decayed_value
        FROM t GROUP BY user_id
    """,
    "w1_topn_per_group": """
        SELECT o_custkey, o_orderkey, o_totalprice FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
            FROM orders
        ) WHERE rn = 1 ORDER BY o_custkey
    """,
    "w2_running_sum": """
        SELECT user_id, event_id,
               ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
                   AS running_value
        FROM events ORDER BY user_id, event_id
    """,
    "w3_lag_delta": """
        SELECT user_id, event_id,
               CAST(FLOOR(epoch(ts)) AS BIGINT)
                 - LAG(CAST(FLOOR(epoch(ts)) AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_sec
        FROM events ORDER BY user_id, event_id
    """,
    "w4_rank_in_partition": """
        SELECT c_nationkey, c_custkey, c_acctbal, rnk FROM (
            SELECT c_nationkey, c_custkey, c_acctbal,
                   DENSE_RANK() OVER (PARTITION BY c_nationkey
                                      ORDER BY c_acctbal DESC) AS rnk
            FROM customer
        ) WHERE rnk <= 3 ORDER BY c_nationkey, rnk, c_custkey
    """,
    # session_window splits when the next event does NOT overlap the
    # previous event's [ts, ts+gap) window — i.e. gap >= 1800 (w5's
    # hand-rolled rule splits strictly > 1800; at µs precision the
    # boundary case cannot occur in the fixture, but the oracle mirrors
    # the exact semantics anyway).
    "w6_session_window": """
        WITH gaps AS (
            SELECT user_id, event_id, ts, value,
                   epoch(ts) - LAG(epoch(ts))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
            FROM events
        ), flagged AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN gap IS NULL OR gap >= 1800 THEN 1 ELSE 0 END
                       AS new_session
            FROM gaps
        ), sessions AS (
            SELECT user_id, value,
                   SUM(new_session) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_id
            FROM flagged
        )
        SELECT user_id, COUNT(*) AS n_events,
               ROUND(SUM(value), 4) AS session_value
        FROM sessions GROUP BY user_id, session_id
    """,
    "w5_sessionize": """
        WITH gaps AS (
            SELECT user_id, event_id, ts, value,
                   CAST(FLOOR(epoch(ts)) AS BIGINT)
                     - LAG(CAST(FLOOR(epoch(ts)) AS BIGINT))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
            FROM events
        ), flagged AS (
            SELECT *, CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END
                        AS new_session
            FROM gaps
        ), sessions AS (
            SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS session_id
            FROM flagged
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 4) AS session_value
        FROM sessions GROUP BY user_id, session_id
        ORDER BY user_id, session_id
    """,
    "w7_ntile_deciles": """
        WITH d AS (
            SELECT o_totalprice,
                   NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
            FROM orders
        )
        SELECT decile, COUNT(*) AS n_orders,
               ROUND(MIN(o_totalprice), 4) AS lo,
               ROUND(MAX(o_totalprice), 4) AS hi,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS band_total
        FROM d GROUP BY decile ORDER BY decile
    """,
}
