"""Join operators (SURVEY §2.6 — a [gap] in the reference).

The reference never joins: its three tables are co-located by directory
and queried independently. The real relationships (``comments.commentOn →
documents.id``, ``comments.docketId → dockets.id``) become equi-joins
here, modeled on the star-schema fixtures.

Scale stance:

* Dimension joins (region/nation/customer) are **broadcast** explicitly —
  at 100 TB the fact side never shuffles for a 25-row dimension. AQE
  would usually infer this, but `F.broadcast` makes the plan contract
  explicit and survives stale statistics.
* Fact-to-fact (lineitem⋈orders) is left to sort-merge + AQE skew
  handling; both sides shuffle-partition on the join key once, and any
  later groupBy on the same key reuses that exchange.
* Semi/anti joins use ``left_semi``/``left_anti`` — no payload columns
  cross the shuffle for the probe side.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: salt the skewed side's key, replicate
    the other side once per salt, join on (key, salt).

    A hot key that would land one monster task is split across
    ``n_salts`` tasks; the other side grows ×n_salts (keep it the
    smaller input). AQE's skew-join split (enabled in session.py)
    handles this adaptively for sort-merge joins — this helper is for
    when the skew is known up front or the join must be planned
    statically. The salt is derived from the skewed row's OTHER
    columns (xxhash64 of the whole row), so it is deterministic,
    needs no extra state, and spreads a hot key uniformly.
    """
    salt = F.pmod(F.xxhash64(*skewed.columns), F.lit(n_salts)).cast("int")
    left = skewed.withColumn("__salt", salt)
    right = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = left.join(right, [key, "__salt"], how)
    return out.drop("__salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
) -> DataFrame:
    """As-of join: attach to each left row the latest right row with
    ``right_ts <= left_ts`` for the same ``on`` key (left outer).

    Spark has no ASOF JOIN operator; the naive inequality-join
    (``l.key = r.key AND r.ts <= l.ts`` + argmax) explodes to the full
    per-key cross product before pruning. The scalable formulation is
    **union + running last_value**: tag both inputs, union them, and run
    one window per key ordered by (ts, side) where right rows sort
    before left rows at equal timestamps (ASOF semantics include
    equality). ``last(col, ignorenulls=True)`` over rows UNBOUNDED
    PRECEDING..CURRENT then carries the most recent right payload onto
    every left row.

    Cost at scale: ONE shuffle of |left|+|right| rows on the key — the
    same price as the equi-join we'd need anyway — and a per-partition
    sort; no row amplification, no skew beyond the key's own frequency.
    """
    lt = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    for c in payload:
        lt = lt.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    rt = right.withColumn("__ts", F.col(right_ts)).withColumn("__side", F.lit(0))
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    cols = [on, "__ts", "__side", *payload, *[c for c in left.columns if c != on]]
    unioned = lt.select(*cols).unionByName(rt.select(*cols))
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*", *[F.last(c, ignorenulls=True).over(w).alias(f"__asof_{c}") for c in payload]
    )
    out = carried.filter(F.col("__side") == 1)
    for c in payload:
        out = out.drop(c).withColumnRenamed(f"__asof_{c}", c)
    return out.drop("__ts", "__side")


def j6_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join on the events stream: each purchase matched to the
    same user's most recent click at-or-before it, plus the gap in
    microseconds. Oracle is DuckDB's native ``ASOF LEFT JOIN``.

    Reference parity: the reference has no joins at all (SURVEY §2.6
    gap); this is the canonical event-attribution query a comments/
    events corpus needs at scale.
    """
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    joined = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="click_ts",
        payload=["click_ts"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "click_ts",
        (F.unix_micros("ts") - F.unix_micros("click_ts")).alias("gap_us"),
    )


def j7_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: lineitems shipped inside the 3 busiest
    order weeks. The interval side is tiny and derived, so the right
    plan is a **broadcast** nested-loop on the range predicate — the
    fact side streams through unshuffled. For a large interval table
    the bucketed variant (`interval_bucket_join` below) applies.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    weeks = (
        orders.groupBy(F.date_trunc("week", "o_orderdate").alias("wk_start"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), "wk_start")
        .limit(3)
        .select(
            "wk_start",
            (F.col("wk_start") + F.expr("INTERVAL 7 DAYS")).alias("wk_end"),
        )
    )
    return (
        li.join(
            F.broadcast(weeks),
            (li.l_shipdate >= weeks.wk_start) & (li.l_shipdate < weeks.wk_end),
        )
        .groupBy(F.col("wk_start").cast("date").alias("wk_start"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("qty"),
        )
        .orderBy("wk_start")
    )


def interval_bucket_join(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    trunc: str = "day",
) -> DataFrame:
    """Large-×-large interval join without a nested loop: explode each
    interval into the fixed-width buckets it overlaps, bucket the fact
    timestamp, equi-join on the bucket, then re-check the exact range.

    Each fact row joins only intervals sharing a bucket — the cross
    product collapses from |facts|×|intervals| to per-bucket locality,
    and the equi-join shuffles/broadcasts like any other. The bucket
    width IS the ``trunc`` unit (hour/day/week/...): the interval
    side's explode step is derived from it, never passed separately —
    a step wider than the trunc unit would emit only every N-th
    boundary on the interval side while facts bucket to EVERY
    boundary, silently dropping matches (review r9). Pick a coarser
    ``trunc`` (not a wider step) to trade interval replication against
    false candidates; it should approximate the median interval
    length.
    """
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.date_trunc(trunc, F.col(start_col)),
                F.date_trunc(trunc, F.col(end_col)),
                F.expr(f"INTERVAL 1 {trunc}"),
            )
        ),
    )
    fx = facts.withColumn("__bucket", F.date_trunc(trunc, F.col(ts_col)))
    out = fx.join(iv, "__bucket").filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return out.drop("__bucket")


def j1_broadcast_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by region: orders ⋈ customer ⋈ nation ⋈ region.

    The three dimension tables are broadcast; the only shuffle is the
    final 5-group aggregation (map-side partials reduce it to ~nothing).
    This is the join shape of "comments per agency" in the reference's
    data model (agency = dimension of dockets).
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("r_name")
    )


def j2_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join: customers having at least one urgent order, counted by
    market segment. ``left_semi`` ships no order payload columns."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("c_mktsegment")
    )


def j3_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join: customers with no high-value (>400k) order."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 400000)
    return (
        customer.join(big, customer.c_custkey == big.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


def j4_fact_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact sort-merge join: lineitem ⋈ orders, revenue per
    order status. Both sides hash-partition on orderkey; AQE splits
    skewed partitions (reference skew analog: 981 vs 25,725 comments
    per docket, CONVERSION_READY.md:37-41)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("net_revenue"),
        )
        .orderBy("o_orderstatus")
    )


def j5_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving unmatched dimension rows: parts with
    their lineitem demand, including never-ordered parts (NULL-safe
    aggregation over the outer side)."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left")
        .groupBy("p_brand")
        .agg(
            F.count(F.col("l_orderkey")).alias("n_big_lines"),
            F.sum(F.coalesce(F.col("l_quantity"), F.lit(0.0)).cast("decimal(18,2)"))
            .cast("double")
            .alias("qty"),
        )
        .orderBy("p_brand")
    )


def j8_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join — the reconciliation shape: customers vs. order
    activity with BOTH unmatched sides preserved (customers who never
    ordered, orders whose customer filter dropped them). Completes the
    join-type matrix (inner/broadcast j1, semi j2, anti j3, fact-fact
    j4, left j5, as-of j6, range j7). Full outer cannot broadcast
    (both sides must surface unmatched rows) — Spark correctly plans a
    shuffle join on the key, one exchange per side."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_acctbal") > 9_000
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400_000
    )
    joined = cust.join(orders, cust.c_custkey == orders.o_custkey, "full")
    side = (
        F.when(F.col("c_custkey").isNull(), "order_only")
        .when(F.col("o_orderkey").isNull(), "customer_only")
        .otherwise("matched")
    )
    return joined.groupBy(side.alias("side")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_orderkey").alias("n_orders"),
        F.count(F.col("c_custkey")).alias("n_customers"),
    )


def u1_union_base_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op (SURVEY §2.8): base + delta UNION ALL read — the Spark
    equivalent of the reference's side-by-side base/delta parquet files
    (simple_iceberg_exploration.py:188-247). In Iceberg this union is
    implicit in snapshot reads; here it is explicit ``unionByName``."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") % 10 < 8)
    delta = orders.filter(F.col("o_orderkey") % 10 >= 8)
    return (
        base.unionByName(delta)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy("o_orderstatus")
    )


def u2_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: INTERSECT — custkeys that both placed an urgent order and
    hold a high balance."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    b = customer.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").cast("long").alias("custkey")
    )
    return a.intersect(b)


def u3_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: EXCEPT — high-balance customers who never ordered urgent."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    a = customer.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").cast("long").alias("custkey")
    )
    b = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.exceptAll(b.distinct())


def u4_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: EXCEPT ALL — MULTISET difference (SURVEY §2.8 completes
    with the bag-semantics variants; u2/u3 are the distinct forms).
    Multiplicity matters wherever copies are bookkeeping — dedup
    accounting, delta reconciliation: here, per event_type, how many
    even-user events exceed the odd-user count. Spark plans exceptAll
    as a generate-over-counted-groups (sum of ±1 replicated), one
    shuffle per side on the compared row — no join explosion. The
    final aggregate bounds the output at |event_type|.
    """
    events = load_table(spark, sf_dir, "events")
    a = events.filter(F.col("user_id") % 2 == 0).select("event_type")
    b = events.filter(F.col("user_id") % 2 == 1).select("event_type")
    return (
        a.exceptAll(b)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("surplus"))
        .orderBy("event_type")
    )


def u5_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op: INTERSECT ALL — the multiset companion to u4: per
    event_type, min(even-user count, odd-user count) occurrences
    survive. Same counted-groups physical shape as exceptAll (one
    exchange per side, no join explosion); aggregated per type so
    output is bounded at |event_type|."""
    events = load_table(spark, sf_dir, "events")
    a = events.filter(F.col("user_id") % 2 == 0).select("event_type")
    b = events.filter(F.col("user_id") % 2 == 1).select("event_type")
    return (
        a.intersectAll(b)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("common"))
        .orderBy("event_type")
    )


def j9_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective fact-fact join — the runtime-bloom-filter shape: a
    small filtered slice of one fact (urgent orders) joins the full
    other fact (lineitem) on orderkey. At 100 TB this is where Spark's
    runtime row-level bloom filter earns its keep: the optimizer
    aggregates the filtered build side's join keys into a bloom filter
    (``bloom_filter_agg``) and injects ``might_contain(...)`` into the
    probe side's SCAN filter, so the ~80% of lineitem rows that can't
    match drop BEFORE the shuffle instead of after it — the shuffle
    shrinks by the build side's selectivity without any manual
    pre-join or hint.

    The query itself is declarative and hint-free: locally the
    filtered side is small enough that AQE simply broadcasts it (also
    eliminating the probe shuffle — the right local plan). The
    at-scale regime — both sides too big to broadcast, bloom filter
    injected — is forced and plan-asserted in
    ``tests/test_plans.py::test_j9_runtime_bloom_filter_regime``,
    including result equality between the two regimes.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("urgent_revenue"),
        )
        .orderBy("l_returnflag")
    )


J11_SALTS = 8


def j11_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated join as a first-class query — ``salted_join``
    (this module) promoted from test helper to driver surface. The
    fact side (events, skewed on ``user_id`` per m10's report) joins a
    per-user dimension with the key salted ``J11_SALTS`` ways: a hot
    user that would land one monster task is spread across
    ``J11_SALTS`` tasks, the dim replicated once per salt.

    The property that matters is RESULT INVARIANCE: salting is purely
    a physical rewrite, so the per-type rollup must hash-equal the
    plain-join oracle. Value totals are DECIMAL-exact sums; dates and
    counts are exact. (On AQE sort-merge plans the adaptive skew split
    covers this case at runtime — the static salt is for plans where
    the skew is known up front; see ``salted_join``'s docstring.)
    """
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value", "ts"
    )
    dim = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    joined = salted_join(events, dim, "user_id", n_salts=J11_SALTS)
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_value"),
            F.min("first_day").alias("earliest_cohort_day"),
        )
        .orderBy("event_type")
    )


J10_BUCKETS = 8

#: age (seconds) past which a leftover j10_* warehouse dir from a
#: crashed run is considered stale and swept; no live run lasts this.
J10_STALE_S = 3600


def _sweep_stale_j10_tables(spark: SparkSession) -> None:
    """Delete j10_* bucketed-table dirs leaked by a crashed run.

    uuid-suffixed names (ADVICE r8) stop concurrent runs dropping each
    other's tables, but also mean a run killed between saveAsTable and
    its finally block leaves a full bucketed copy of orders+lineitem
    on disk forever. The catalog entry dies with the session (in-memory
    catalog), so cleanup is filesystem-level: sweep warehouse dirs with
    the j10_ prefix older than J10_STALE_S — old enough that they
    cannot belong to a live run, so the concurrency guarantee holds.
    """
    import os
    import shutil
    import time

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    root = warehouse.removeprefix("file:")
    if not root or not os.path.isdir(root):
        return
    cutoff = time.time() - J10_STALE_S
    for name in os.listdir(root):
        if name.startswith(("j10_orders_b_", "j10_lineitem_b_")):
            path = os.path.join(root, name)
            try:
                if os.path.getmtime(path) < cutoff:
                    shutil.rmtree(path, ignore_errors=True)
            except OSError:
                continue


def j10_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join with ZERO join-time exchange — the bucketing
    payoff (SURVEY §2.6 at 100 TB): orders and lineitem are written
    ``bucketBy(N, orderkey)``, so both scans arrive hash-partitioned
    on the join key and the SortMergeJoin consumes them directly —
    the plan contains no Exchange between either scan and the join
    (asserted in tests/test_plans.py). At 100 TB this converts the
    recurring full-corpus shuffle of every orderkey join into a
    one-time layout cost paid at ingest.

    Same aggregate as j4's fact-fact shape so the payoff is
    comparable: per-status line counts and DECIMAL-exact revenue.
    Tables are session-scoped temps dropped before return; the result
    is materialized first (bounded at |statuses| rows).
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    # Per-invocation table names: a fixed name in the shared session
    # warehouse would let a concurrent bench/test run DROP the other
    # run's tables mid-query (ADVICE r8).
    tok = uuid.uuid4().hex[:8]
    to, tl = f"j10_orders_b_{tok}", f"j10_lineitem_b_{tok}"
    _sweep_stale_j10_tables(spark)
    try:
        (
            orders.write.bucketBy(J10_BUCKETS, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable(to)
        )
        (
            li.write.bucketBy(J10_BUCKETS, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable(tl)
        )
        out = (
            spark.table(tl)
            .join(
                spark.table(to),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                )
                .cast("double")
                .alias("revenue"),
            )
            .orderBy("o_orderstatus")
        )
        rows = [tuple(r) for r in out.collect()]
        return spark.createDataFrame(
            rows, "o_orderstatus string, n_lines long, revenue double"
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {to}")
        spark.sql(f"DROP TABLE IF EXISTS {tl}")


J12_WINDOW_HOURS = 2  # incident-window width

# The j13/j14 driver-side cross-midnight stitch inspects only each
# day's FIRST and LAST episode, which is exact only while a chain can
# cross at most one midnight — i.e. while the window width is shorter
# than the day partition unit. Fail loudly at import if the dial is
# ever retuned past that precondition (ADVICE r11).
if not J12_WINDOW_HOURS < 24:
    raise ValueError(
        "J12_WINDOW_HOURS must stay < 24: the j13/j14 cross-midnight "
        "stitch merges at most one episode per day boundary, which is "
        "exact only when the incident window is narrower than the "
        "per-day partition unit (see _daily_error_episodes)."
    )


def j12_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-×-large interval OVERLAP join on the driver surface —
    ``interval_bucket_join`` promoted from an equivalence-tested helper
    to an oracle-checked query (j7 covers the broadcast-small-side
    range join; this is the case where BOTH sides are data-sized, the
    shape a nested-loop range join cannot survive at 100 TB). Scenario:
    every 'error' event opens a {hours}-hour incident window; each
    event is attributed to every window containing its timestamp
    (within-incident activity attribution). Output: per event_type,
    the (event, window) membership-pair count, distinct events covered,
    and an id checksum over the pair multiset.

    Scale shape: intervals explode into the hour buckets they overlap
    (≤ {hours}+1 rows each); facts bucket by hour; ONE equi-join on
    the bucket + an exact range re-check. Both sides shuffle on the
    bucket key — per-bucket locality replaces the |facts|×|intervals|
    cross product, and skewed buckets ride AQE skew-join like any
    other equi-join. The rollup output is |event_types|-bounded.

    Oracle: DuckDB's native inequality join (IEJoin) over the same
    window derivation — the declarative spec of the bucketed rewrite.
    """
    events = load_table(spark, sf_dir, "events")
    windows = events.filter(F.col("event_type") == "error").select(
        F.col("ts").alias("w_start"),
        F.expr(f"ts + INTERVAL {J12_WINDOW_HOURS} HOURS").alias("w_end"),
    )
    pairs = interval_bucket_join(
        events.select("event_id", "ts", "event_type"),
        windows,
        "ts",
        "w_start",
        "w_end",
        trunc="hour",
    )
    return (
        pairs.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("event_id").alias("n_events_covered"),
            F.sum("event_id").alias("id_checksum"),
        )
        .orderBy("event_type")
    )


j12_interval_overlap_join.__doc__ = j12_interval_overlap_join.__doc__.format(
    hours=J12_WINDOW_HOURS
)


def _daily_error_episodes(events: DataFrame) -> DataFrame:
    """Per-DAY coalesced incident episodes (shared j13/j14 core):
    every 'error' event opens a ``J12_WINDOW_HOURS``-hour window;
    windows are merged into disjoint islands WITHIN each day (running
    max + new-island flag + cumulative group id, all windows
    partitioned by day — parallel across days, never the global
    running-max single partition). Returns one row per (day, grp)
    episode: ``cs``/``ce`` timestamps plus ``n_w``, the raw-window
    count that rode the aggregation (so corpus totals never need a
    second scan of the events lineage). Cross-midnight chains are the
    caller's driver-side stitch (see j13/j14 — exact because the
    window width < 1 day bounds a chain tail to one boundary merge).
    """
    w = events.filter(F.col("event_type") == "error").select(
        F.col("ts").alias("s"),
        F.expr(f"ts + INTERVAL {J12_WINDOW_HOURS} HOURS").alias("e"),
        F.date_trunc("day", F.col("ts")).alias("day"),
    )
    from pyspark.sql import Window

    ord_w = Window.partitionBy("day").orderBy("s", "e")
    prev_max = F.max("e").over(
        ord_w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = w.withColumn(
        "new_island",
        (prev_max.isNull() | (F.col("s") > prev_max)).cast("int"),
    ).withColumn("grp", F.sum("new_island").over(ord_w))
    return flagged.groupBy("day", "grp").agg(
        F.min("s").alias("cs"),
        F.max("e").alias("ce"),
        F.count(F.lit(1)).alias("n_w"),
    )


def j13_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval COALESCING (gaps-and-islands) — merge overlapping
    incident windows into disjoint episodes: the deployment-side
    density bound PLANS names as j12's answer (attribution against
    coalesced episodes is linear, not quadratic, in window rate), and
    the classic sessionize-the-timeline operator every alerting/SLA
    pipeline runs.

    Scale shape — the naive islands rewrite is a GLOBAL running max
    (Exchange SinglePartition: the w7 trap). Instead, two phases:
    per-DAY islands (running max + new-island flag + cumulative group
    id, all windows partitioned by day — parallel across days, each
    partition bounded by a day's window rate), then a driver-side
    stitch over the |days|-row boundary summary that merges each day's
    chain tail with the next day's first episode. The stitch is exact
    because every window has the same width W = {hours}h < 1 day: a
    cross-midnight chain reaches at most W past midnight, and the next
    day's SECOND episode starts after its first episode's end ≥ its
    start + W ≥ midnight + W ≥ the chain tail — so at most ONE merge
    per boundary, with closed-form overlap corrections. (Generalize by
    picking a partition unit ≫ max interval width — the same
    precondition a watermark puts on lateness.)

    Oracle: the textbook GLOBAL islands SQL in DuckDB — parity proves
    the day-partition + stitch decomposition equals the global answer.
    All outputs integer (epoch-microsecond arithmetic, // to seconds
    after summation).
    """
    events = load_table(spark, sf_dir, "events")
    eps = _daily_error_episodes(events).select(
        "day",
        "grp",
        F.unix_micros("cs").alias("cs"),
        F.unix_micros("ce").alias("ce"),
        "n_w",
    )
    day_rows = (
        eps.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_eps"),
            F.sum("n_w").alias("n_windows"),
            F.sum(F.col("ce") - F.col("cs")).alias("covered_us"),
            F.min_by(F.struct("cs", "ce"), "cs").alias("first_ep"),
            F.max_by(F.struct("cs", "ce"), "cs").alias("last_ep"),
        )
        .orderBy("day")
        .collect()
    )
    n_windows = sum(r["n_windows"] for r in day_rows)
    # driver-side boundary stitch over the |days|-row summary
    episodes = 0
    covered_us = 0
    merges = 0
    open_ce = None  # chain tail end (micros) carried across boundaries
    for r in day_rows:
        episodes += r["n_eps"]
        covered_us += r["covered_us"]
        f_cs, f_ce = r["first_ep"]["cs"], r["first_ep"]["ce"]
        if open_ce is not None and f_cs <= open_ce:
            merges += 1
            episodes -= 1
            covered_us -= min(open_ce, f_ce) - f_cs  # double-counted span
        # the chain into the NEXT boundary is this day's last episode
        # (possibly extended by the merge when it IS the first episode)
        l_cs, l_ce = r["last_ep"]["cs"], r["last_ep"]["ce"]
        if r["n_eps"] == 1 and open_ce is not None and f_cs <= open_ce:
            open_ce = max(open_ce, l_ce)
        else:
            open_ce = l_ce
    rows = [
        (
            int(n_windows),
            int(episodes),
            int(merges),
            int(covered_us // 1_000_000),
        )
    ]
    return spark.createDataFrame(
        rows,
        "n_windows long, n_episodes long, n_boundary_merges long,"
        " covered_s long",
    )


j13_interval_coalesce.__doc__ = j13_interval_coalesce.__doc__.format(
    hours=J12_WINDOW_HOURS
)


def j14_episode_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    r"""Attribution against COALESCED episodes — j12's incident
    attribution re-run after j13's interval coalescing, the
    deployment-side fix PLANS.md names for j12's honest adversarial
    row (pair output is intrinsically quadratic in window density;
    against disjoint episodes every event matches at most ONE
    episode, so output is linear in events by construction, at any
    density). Per event_type: events covered by any episode, distinct
    episodes touched, and an id checksum over the covered set.

    Shape: (1) j13's per-day islands (parallel across days, no global
    running max); (2) the driver-side boundary stitch upgraded from
    counting merges to EMITTING them — it walks the \|days\|-row
    first/last-episode summary, collects the (day, grp) keys of each
    cross-midnight chain and its merged interval, and rewrites the
    episode set as a broadcast anti-join (remove chain members) plus a
    driver-sized union (add merged episodes) — both sides bounded by
    \|days\|, never data-sized; (3) j12's bucketed interval equi-join
    (explode episodes into hour buckets, bucket facts, equi-join +
    exact range re-check) — per-bucket locality instead of
    \|facts\|×\|episodes\|, AQE-skew-joinable like any equi-join.

    Oracle: DuckDB global-islands SQL + native IEJoin — parity proves
    day-decomposition + stitch + bucket join ≡ global coalesce +
    inequality join. Disjointness is visible in the output itself:
    COUNT(*) per type equals COUNT(DISTINCT event_id).
    """
    events = load_table(spark, sf_dir, "events")
    # eps feeds TWO consumers — the |days|-row stitch summary below
    # and the geps episode set the bucket join reads — cache, or the
    # events scan + per-day island windows execute twice
    eps = _daily_error_episodes(events).cache()
    day_rows = (
        eps.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_eps"),
            F.min_by(F.struct("grp", "cs", "ce"), "cs").alias("first_ep"),
            F.max_by(F.struct("grp", "cs", "ce"), "cs").alias("last_ep"),
        )
        .orderBy("day")
        .collect()
    )
    # driver-side stitch over the |days|-row summary: collect each
    # cross-midnight chain's member keys and its merged interval
    removed: list[tuple] = []  # (day, grp) keys absorbed into chains
    merged: list[tuple] = []  # (cs, ce) replacement episodes
    chain_keys: list[tuple] = []
    chain_cs = chain_ce = None

    def _close_chain() -> None:
        if len(chain_keys) >= 2:
            removed.extend(chain_keys)
            merged.append((chain_cs, chain_ce))

    for r in day_rows:
        f, last = r["first_ep"], r["last_ep"]
        if chain_keys and f["cs"] <= chain_ce:
            chain_keys.append((r["day"], f["grp"]))
            chain_ce = max(chain_ce, f["ce"])
            if r["n_eps"] > 1:
                _close_chain()
                chain_keys = [(r["day"], last["grp"])]
                chain_cs, chain_ce = last["cs"], last["ce"]
            # single-episode day: the chain stays open into the next
            # boundary (a multi-midnight chain — each day one episode)
        else:
            _close_chain()
            chain_keys = [(r["day"], last["grp"])]
            chain_cs, chain_ce = last["cs"], last["ce"]
    _close_chain()
    if removed:
        rem = spark.createDataFrame(removed, "day timestamp, grp long")
        geps = (
            eps.join(F.broadcast(rem), ["day", "grp"], "left_anti")
            .select("cs", "ce")
            .unionByName(
                spark.createDataFrame(merged, "cs timestamp, ce timestamp")
            )
        )
    else:
        geps = eps.select("cs", "ce")
    pairs = interval_bucket_join(
        events.select("event_id", "ts", "event_type"),
        geps.select(
            F.col("cs").alias("e_start"), F.col("ce").alias("e_end")
        ),
        "ts",
        "e_start",
        "e_end",
        trunc="hour",
    )
    out = (
        pairs.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct(F.unix_micros("e_start")).alias(
                "n_episodes_touched"
            ),
            F.sum("event_id").alias("id_checksum"),
        )
        .orderBy("event_type")
    )
    from .util import materialize_release

    # |event_types|-row output: collect it and release the eps cache
    return materialize_release(spark, out, eps)


QUERIES = {
    "j12_interval_overlap_join": j12_interval_overlap_join,
    "j13_interval_coalesce": j13_interval_coalesce,
    "j14_episode_attribution": j14_episode_attribution,
    "j1_broadcast_star_join": j1_broadcast_star_join,
    "j9_bloom_pruned_join": j9_bloom_pruned_join,
    "j2_semi_join": j2_semi_join,
    "j3_anti_join": j3_anti_join,
    "j4_fact_fact_join": j4_fact_fact_join,
    "j5_left_outer_join": j5_left_outer_join,
    "j6_asof_join": j6_asof_join,
    "j7_range_join": j7_range_join,
    "j8_full_outer_join": j8_full_outer_join,
    "u1_union_base_delta": u1_union_base_delta,
    "u2_intersect": u2_intersect,
    "u3_except": u3_except,
    "u4_except_all": u4_except_all,
    "u5_intersect_all": u5_intersect_all,
    "j10_bucketed_colocated_join": j10_bucketed_colocated_join,
    "j11_salted_skew_join": j11_salted_skew_join,
}

ORACLE = {
    # j14: global-islands coalesce + DuckDB's native inequality join
    # (IEJoin) — the declarative spec of the day-decomposed stitch +
    # bucketed attribution.
    "j14_episode_attribution": f"""
        WITH w AS (
            SELECT ts AS s, ts + INTERVAL {J12_WINDOW_HOURS} HOUR AS e
            FROM events WHERE event_type = 'error'
        ), o AS (
            SELECT s, e,
                   MAX(e) OVER (ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS pm
            FROM w
        ), g AS (
            SELECT s, e,
                   SUM(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
                       OVER (ORDER BY s, e
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS grp
            FROM o
        ), eps AS (
            SELECT grp, MIN(s) AS cs, MAX(e) AS ce FROM g GROUP BY grp
        )
        SELECT f.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT epoch_us(eps.cs)) AS BIGINT)
                   AS n_episodes_touched,
               CAST(SUM(f.event_id) AS BIGINT) AS id_checksum
        FROM events f JOIN eps
          ON f.ts >= eps.cs AND f.ts < eps.ce
        GROUP BY f.event_type ORDER BY f.event_type
    """,
    # j13: the textbook GLOBAL islands SQL — parity proves the
    # day-partition + driver-stitch decomposition equals the global
    # answer. n_boundary_merges = day-level episode count minus global
    # episode count (each cross-midnight merge removes exactly one).
    "j13_interval_coalesce": f"""
        WITH w AS (
            SELECT ts AS s, ts + INTERVAL {J12_WINDOW_HOURS} HOUR AS e
            FROM events WHERE event_type = 'error'
        ), o AS (
            SELECT s, e,
                   MAX(e) OVER (ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS pm
            FROM w
        ), g AS (
            SELECT s, e,
                   SUM(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
                       OVER (ORDER BY s, e
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS grp
            FROM o
        ), eps AS (
            SELECT grp, MIN(epoch_us(s)) AS cs, MAX(epoch_us(e)) AS ce
            FROM g GROUP BY grp
        ), d1 AS (
            SELECT s, e,
                   MAX(e) OVER (PARTITION BY date_trunc('day', s)
                                ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS pm
            FROM w
        ), dn AS (
            SELECT COALESCE(SUM(CASE WHEN pm IS NULL OR s > pm
                                     THEN 1 ELSE 0 END), 0) AS n_day_eps
            FROM d1
        )
        SELECT CAST((SELECT COUNT(*) FROM w) AS BIGINT) AS n_windows,
               CAST((SELECT COUNT(*) FROM eps) AS BIGINT) AS n_episodes,
               CAST((SELECT n_day_eps FROM dn)
                    - (SELECT COUNT(*) FROM eps) AS BIGINT)
                   AS n_boundary_merges,
               CAST(COALESCE((SELECT SUM(ce - cs) FROM eps), 0)
                    // 1000000 AS BIGINT) AS covered_s
    """,
    # j12: DuckDB's native inequality join (IEJoin) is the declarative
    # spec of the bucketed rewrite.
    "j12_interval_overlap_join": f"""
        WITH w AS (
            SELECT ts AS w_start,
                   ts + INTERVAL {J12_WINDOW_HOURS} HOUR AS w_end
            FROM events WHERE event_type = 'error'
        )
        SELECT f.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(COUNT(DISTINCT f.event_id) AS BIGINT)
                   AS n_events_covered,
               CAST(SUM(f.event_id) AS BIGINT) AS id_checksum
        FROM events f JOIN w
          ON f.ts >= w.w_start AND f.ts < w.w_end
        GROUP BY f.event_type ORDER BY f.event_type
    """,
    "j11_salted_skew_join": """
        WITH dim AS (
            SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
            FROM events GROUP BY user_id
        )
        SELECT e.event_type,
               COUNT(*) AS n_rows,
               CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
               CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE)
                   AS total_value,
               MIN(d.first_day) AS earliest_cohort_day
        FROM events e JOIN dim d USING (user_id)
        GROUP BY e.event_type ORDER BY e.event_type
    """,
    "j10_bucketed_colocated_join": """
        SELECT o_orderstatus, COUNT(*) AS n_lines,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                    AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "j9_bloom_pruned_join": """
        SELECT l_returnflag,
               COUNT(*) AS n_lines,
               CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,4))) AS DOUBLE) AS urgent_revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "j8_full_outer_join": """
        WITH c AS (SELECT * FROM customer WHERE c_acctbal > 9000),
             o AS (SELECT * FROM orders WHERE o_totalprice > 400000),
             j AS (
                 SELECT c.c_custkey, o.o_orderkey
                 FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey
             )
        SELECT CASE WHEN c_custkey IS NULL THEN 'order_only'
                    WHEN o_orderkey IS NULL THEN 'customer_only'
                    ELSE 'matched' END AS side,
               COUNT(*) AS n_rows,
               COUNT(o_orderkey) AS n_orders,
               COUNT(c_custkey) AS n_customers
        FROM j GROUP BY side
    """,
    "j1_broadcast_star_join": """
        SELECT r_name, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
    """,
    "j2_semi_join": """
        SELECT c_mktsegment, COUNT(*) AS cnt FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "j3_anti_join": """
        SELECT c_mktsegment, COUNT(*) AS cnt,
               ROUND(AVG(c_acctbal), 4) AS avg_acctbal
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "j4_fact_fact_join": """
        SELECT o_orderstatus, COUNT(*) AS n_lines,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
                   AS net_revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "j5_left_outer_join": """
        SELECT p_brand, COUNT(l_orderkey) AS n_big_lines,
               CAST(SUM(CAST(COALESCE(l_quantity, 0.0) AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM part
        LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity > 45) li
               ON p_partkey = li.l_partkey
        GROUP BY p_brand ORDER BY p_brand
    """,
    "j6_asof_join": """
        WITH p AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase'),
             c AS (SELECT user_id, ts AS click_ts FROM events
                   WHERE event_type = 'click')
        SELECT p.event_id, p.user_id, p.ts AS purchase_ts, c.click_ts,
               epoch_us(p.ts) - epoch_us(c.click_ts) AS gap_us
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.ts >= c.click_ts
    """,
    "j7_range_join": """
        WITH weeks AS (
            SELECT date_trunc('week', o_orderdate) AS wk_start,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY 1
            ORDER BY n_orders DESC, wk_start LIMIT 3
        )
        SELECT wk_start, COUNT(*) AS n_lines,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM lineitem JOIN weeks
          ON l_shipdate >= wk_start
         AND l_shipdate < wk_start + INTERVAL 7 DAY
        GROUP BY wk_start ORDER BY wk_start
    """,
    "u1_union_base_delta": """
        SELECT o_orderstatus, COUNT(*) AS cnt,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM (
            SELECT * FROM orders WHERE o_orderkey % 10 < 8
            UNION ALL
            SELECT * FROM orders WHERE o_orderkey % 10 >= 8
        )
        GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "u2_intersect": """
        SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        INTERSECT
        SELECT CAST(c_custkey AS BIGINT) AS custkey FROM customer WHERE c_acctbal > 5000
        ORDER BY custkey
    """,
    "u3_except": """
        SELECT CAST(c_custkey AS BIGINT) AS custkey FROM customer WHERE c_acctbal > 5000
        EXCEPT
        SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        ORDER BY custkey
    """,
    "u4_except_all": """
        WITH d AS (
            SELECT event_type FROM events WHERE user_id % 2 = 0
            EXCEPT ALL
            SELECT event_type FROM events WHERE user_id % 2 = 1
        )
        SELECT event_type, COUNT(*) AS surplus
        FROM d GROUP BY event_type ORDER BY event_type
    """,
    "u5_intersect_all": """
        WITH d AS (
            SELECT event_type FROM events WHERE user_id % 2 = 0
            INTERSECT ALL
            SELECT event_type FROM events WHERE user_id % 2 = 1
        )
        SELECT event_type, COUNT(*) AS common
        FROM d GROUP BY event_type ORDER BY event_type
    """,
}
