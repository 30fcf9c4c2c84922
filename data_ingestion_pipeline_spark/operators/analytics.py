"""Star-schema analytical queries (north-star extensions, SURVEY.md §7.8).

The reference has no joins (single-table schema, SURVEY.md §2.9);
these add the relational-analytics surface a user of a real pipeline
needs, over the driver's TPC-H-ish testdata.

Scale design, per query:
- dimension tables (region, nation — O(10..10^2) rows at any SF) are
  explicitly `F.broadcast()` so the big fact side never shuffles for
  them;
- fact⋈fact joins (orders⋈lineitem) shuffle on the join key once —
  at 100 TB both sides would be bucketed by orderkey at write time,
  turning this into a co-located join (see operators/upsert.py);
- all top-k use deterministic tie-breaks so results are stable under
  any partitioning (and match the single-threaded oracle);
- float aggregates via exact decimal sums (functions/exact.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.functions.exact import dec_avg, dec_sum
from data_ingestion_pipeline_spark.sources.tables import load_table

def _disc_price() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _charge() -> F.Column:
    return _disc_price() * (1 + F.col("l_tax"))


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: 2-key groupBy, 8 aggregates.

    One scan (shipdate predicate pushed to parquet), map-side partial
    agg, 6-group result — the canonical whole-stage-codegen agg.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            dec_sum(_disc_price()).alias("sum_disc_price"),
            dec_sum(_charge()).alias("sum_charge"),
            dec_avg("l_quantity").alias("avg_qty"),
            dec_avg("l_extendedprice").alias("avg_price"),
            dec_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: revenue per nation for one region and year.

    region and nation are broadcast (tiny at every SF); customer joins
    the orders side on custkey; orders⋈lineitem is the one real
    shuffle. Catalyst pushes the region/date filters below the joins.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dec_sum(_disc_price()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


def shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: top-10 unshipped orders by revenue.

    BUILDING-segment customers, orders placed before the cutoff,
    lineitems shipped after it. Deterministic LIMIT via
    (revenue DESC, o_orderkey) ordering.
    """
    cutoff = F.lit("1997-01-01").cast("timestamp")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dec_sum(_disc_price()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 customers by lifetime lineitem revenue.

    Aggregate lineitem→orders first (pre-aggregation shrinks the
    probe side before the customer join — the scalable order), then
    join the per-customer totals to names.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    per_order = li.groupBy("l_orderkey").agg(dec_sum(_disc_price()).alias("order_rev"))
    per_cust = (
        per_order.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum(F.col("order_rev").cast("decimal(38,6)")).cast("double").alias("revenue"))
    )
    return (
        per_cust.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(10)
    )


def revenue_by_part_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue and volume by part type (Q14-flavored join to part).

    part is broadcast below the broadcast-join threshold; at SFs
    where it isn't, AQE falls back to shuffle join automatically.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type")
        .agg(
            dec_sum(_disc_price()).alias("revenue"),
            dec_sum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("line_count"),
        )
        .orderBy("p_type")
    )


def supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per supplier with nation name (two broadcast dims)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_suppkey", "s_name", "n_name")
        .agg(dec_sum(_disc_price()).alias("revenue"))
        .orderBy("s_suppkey")
    )


def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by total price (ranking window).

    The general per-group-top-k (W1 generalizes from top-1); one
    shuffle on the window key, no join.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
    )


def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) with subtotal rows.

    Grouping-set nulls are coalesced to 'ALL' so the result is
    key-addressable (and oracle-comparable) without grouping_id.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "count_order",
        )
    )


def event_type_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct + approximate-distinct users per event type.

    countDistinct is the exact (2-shuffle) path; approx_count_distinct
    (HyperLogLog++) is the single-pass path that scales to 100 TB —
    both exposed; the approx column is checked rows-only via a
    separate entry (approx values are engine-specific).
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("distinct_users"),
        F.count(F.lit(1)).alias("event_count"),
    )


def event_type_cardinality_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct users — product-facing estimates
    (sketch values are engine-specific, so the registry checks the
    within-bound twin below; the raw estimate path is additionally
    tested in tests/test_analytics.py against the exact count)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_distinct_users")
    )


def event_type_cardinality_within_bound(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Registry twin of event_type_cardinality_approx with a
    QUANTITATIVE SQL oracle (hll_rollup_within_bound pattern): each
    row carries the exact per-type distinct count plus a verdict that
    the HLL++ estimate (rsd=0.01) landed within the documented
    relative-error bound. The DuckDB oracle reproduces the exact
    counts and asserts TRUE, so the driver's hash compare checks the
    sketch's accuracy contract, not just row counts. One grouped agg
    computes sketch and exact side by side (single scan/shuffle)."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx"),
        F.count_distinct(F.col("user_id")).alias("exact_distinct_users"),
    )
    bound = F.lit(HLL_REL_ERROR_BOUND)
    return agg.select(
        "event_type",
        "exact_distinct_users",
        (
            F.abs(F.col("approx") - F.col("exact_distinct_users"))
            <= bound * F.col("exact_distinct_users")
        ).alias("within_bound"),
    )


def big_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with at least one order over 450k — LEFT SEMI join.

    Semi join is the EXISTS-subquery shape: the orders side reduces
    to its distinct keys during the shuffle (no fact-row fanout, no
    duplicate customers), which is the property that matters when the
    right side is 100 TB of orders.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 450000
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


def orders_without_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with no lineitem rows — LEFT ANTI join (NOT EXISTS).

    The integrity-audit query shape: anti join shuffles only keys of
    the right side; at scale both tables bucketed on orderkey make it
    co-located.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return orders.join(
        li, orders.o_orderkey == li.l_orderkey, "left_anti"
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")


def power_users_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users with both a high-value click AND a high-value purchase —
    INTERSECT of two distinct-key sets (set operation surface;
    absent in the reference, SURVEY.md §2.9).
    """
    ev = load_table(spark, sf_dir, "events")
    clickers = (
        ev.filter((F.col("event_type") == "click") & (F.col("value") > 150))
        .select("user_id")
        .distinct()
    )
    buyers = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 150))
        .select("user_id")
        .distinct()
    )
    return clickers.intersect(buyers)


def cube_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 2^2 grouping-set
    combinations in one pass (rollup_pricing covers the hierarchical
    subset). Spark plans grouping sets as a single expand+aggregate —
    one shuffle regardless of the number of sets."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "count_order",
        )
    )


def props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: pull a typed field out of the events
    table's JSON `props` column and aggregate it — the
    get_json_object path stays JVM-side (Jackson), no Python."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("event_count"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


def station_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-station least-squares trend of value over time — advanced
    analytics kept EXACT across engines.

    Not regr_slope(): its internal float accumulation is
    order-dependent, so a cluster run would not hash-match the
    oracle. Instead the four sufficient statistics are accumulated
    exactly (integer seconds, decimal products; time is centered on
    2024-01-15 so every product stays well inside exact-double/long
    range), and the slope is assembled in a fixed sequence of single
    IEEE ops on identical inputs — bit-identical on any engine or
    partitioning.
    """
    ev = load_table(spark, sf_dir, "events")
    x = F.expr("unix_micros(ts) div 1000000") - F.lit(1705276800)
    y = F.col("value")
    stats = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y.cast("decimal(38,6)")).cast("double").alias("sy"),
        F.sum((x * y).cast("decimal(38,6)")).cast("double").alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double")
    sxx_d = F.col("sxx").cast("double")
    slope = (n_d * F.col("sxy") - sx_d * F.col("sy")) / (
        n_d * sxx_d - sx_d * sx_d
    )
    return stats.select(
        "user_id", slope.alias("slope"), F.col("n").alias("reading_count")
    )


def station_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows more than 3σ above their station's mean — anomaly
    flagging with exactness preserved: per-station mean/variance come
    from decimal sums (Σy, Σy²) and the z-score test is a fixed
    sequence of IEEE ops on identical inputs, so the flagged set is
    identical on any engine/partitioning. The 150-row stats side
    broadcasts; the fact scan streams once.
    """
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("sy"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(38,6)"))
        .cast("double")
        .alias("s2"),
    )
    m = F.col("sy") / F.col("n")
    sigma = F.sqrt(F.col("s2") / F.col("n") - m * m)
    return (
        ev.join(F.broadcast(stats), "user_id")
        .filter(F.col("value") > m + F.lit(3.0) * sigma)
        .select(
            "event_id",
            "user_id",
            "ts",
            "value",
            ((F.col("value") - m) / sigma).alias("zscore"),
        )
    )


QUANTILES = (0.25, 0.5, 0.75, 0.95)


def value_quantiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles of value per event type (p25/p50/p75/p95).

    Spark's `percentile` aggregate with an array argument sorts each
    group ONCE and interpolates all requested quantiles from it; the
    linear-interpolation definition (lower + (upper−lower)·frac on the
    sorted group) is the same correctly-rounded IEEE sequence DuckDB's
    quantile_cont runs, so the results are bit-identical across
    engines (verified empirically at sf0.01 before this oracle was
    pinned). Exact percentile is a per-group sort — fine when groups
    are few and fit (5 types here); for high-cardinality groups at
    100 TB use approx_percentile (see
    tests/test_analytics.py::test_approx_percentile_within_bound).
    """
    ev = load_table(spark, sf_dir, "events")
    p = F.percentile("value", F.array(*[F.lit(q) for q in QUANTILES]))
    return (
        ev.groupBy("event_type")
        .agg(p.alias("p"))
        .select(
            "event_type",
            F.col("p")[0].alias("p25"),
            F.col("p")[1].alias("p50"),
            F.col("p")[2].alias("p75"),
            F.col("p")[3].alias("p95"),
        )
    )


PIVOT_TYPES = ("click", "view", "purchase", "signup", "error")


def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-station average value, one column per event type —
    the wide-format report shape. The pivot values are EXPLICIT
    (PIVOT_TYPES): with an implicit pivot Spark first runs a distinct
    job over the key column to discover columns — a full extra scan at
    100 TB and a nondeterministic column set; with explicit values the
    pivot is a single pass compiling to one aggregate with conditional
    branches (exactly the CASE-aggregation the oracle spells out).
    Stations missing a type get NULL on both engines (empty decimal
    sum / zero count).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", list(PIVOT_TYPES))
        .agg(dec_avg("value"))
        .select(
            "user_id",
            *[F.col(t).alias(f"{t}_avg") for t in PIVOT_TYPES],
        )
    )


def event_type_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): the wide per-station pivot back to long
    (user_id, event_type, avg_value) rows — the wide→long reshape
    every report/export pipeline needs. Spark's native ``unpivot``
    compiles to an Expand node: each input row fans out to one row per
    value column IN PLACE — map-side, zero shuffle beyond the pivot's
    own aggregate, column count fixed at plan time. NULL cells (a
    station that never emitted a type) are dropped, matching the melt
    convention (and the oracle's WHERE avg IS NOT NULL).
    """
    wide = event_type_pivot(spark, sf_dir)
    return (
        wide.unpivot(
            "user_id",
            [f"{t}_avg" for t in PIVOT_TYPES],
            "event_type",
            "avg_value",
        )
        .filter(F.col("avg_value").isNotNull())
        .withColumn(
            "event_type",
            F.expr("substring(event_type, 1, length(event_type) - 4)"),
        )
    )


def customer_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: every customer and every order-aggregate row
    survives — the reconciliation shape (find customers with no
    orders AND orders whose customer is missing) that inner/left
    semantics silently drop. Spark plans a shuffled full-outer hash
    join on the key; the aggregate side is pre-reduced so the join
    carries one row per customer key, not one per order.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            dec_sum("o_totalprice").alias("total_spend"),
        )
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "full_outer")
        .select(
            F.coalesce("c_custkey", "o_custkey").alias("custkey"),
            "c_name",
            "c_acctbal",
            F.coalesce("order_count", F.lit(0)).alias("order_count"),
            F.coalesce("total_spend", F.lit(0.0)).alias("total_spend"),
        )
    )


def inactive_users_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set difference): stations that emitted events but never
    a purchase — completes the set-operation surface (INTERSECT is
    power_users_intersect, UNION is throughout). ``subtract`` is EXCEPT
    DISTINCT; Spark compiles it to a left-anti join over distinct rows
    — one shuffle per side at scale.
    """
    ev = load_table(spark, sf_dir, "events")
    all_users = ev.select("user_id")
    purchasers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return all_users.subtract(purchasers)


def hll_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregable distinct counts via HLL sketches — the scale
    answer to COUNT(DISTINCT): daily user sketches union into any
    coarser period WITHOUT re-reading raw events, the same
    partial-recomposition contract as rollup_multires_1d but for a
    non-additive measure (distinct counts don't sum; sketches merge).

    Emits one row per day — the sketch estimate next to the exact
    count, so the error is auditable — plus a total row (bucket NULL)
    whose estimate comes from UNIONING the daily sketches, never from
    rescanning. Shape: one grouped agg (map-side partial sketches),
    then a driver-sized union over ~365 rows/year. Registry evidence
    is rows-only (DataSketches binaries are Spark-specific); the
    pytest twin bounds per-day and union error and pins determinism.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("bucket")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct(F.col("user_id")).alias("exact_users"),
    )
    per_day = daily.select(
        "bucket",
        F.hll_sketch_estimate("sk").alias("approx_users"),
        "exact_users",
    )
    total = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
    ).select(
        F.lit(None).cast("timestamp").alias("bucket"),
        "approx_users",
        F.lit(None).cast("bigint").alias("exact_users"),
    )
    return per_day.unionByName(total)


HLL_REL_ERROR_BOUND = 0.05  # lgConfigK=12 → 3σ ≈ 2.4%; 5% is generous


def hll_rollup_within_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry twin of hll_user_rollup with a QUANTITATIVE SQL oracle:
    instead of emitting raw sketch estimates (engine-specific, never
    hash-matchable), each row carries the exact distinct count and a
    boolean verdict that the sketch estimate landed within the
    documented relative-error bound — per day AND for the
    union-of-daily-sketches total. The DuckDB oracle reproduces the
    exact counts and asserts TRUE, so the driver's hash compare now
    checks the sketch's accuracy contract, not just row counts.
    The product-facing estimates stay in hll_user_rollup; both share
    the one grouped sketch agg construction.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("bucket")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct(F.col("user_id")).alias("exact_users"),
    )
    bound = F.lit(HLL_REL_ERROR_BOUND)
    per_day = daily.select(
        "bucket",
        "exact_users",
        (
            F.abs(F.hll_sketch_estimate("sk") - F.col("exact_users"))
            <= bound * F.col("exact_users")
        ).alias("within_bound"),
    )
    # union-of-sketches estimate vs a true global distinct: the exact
    # side is NOT derivable from daily exacts (distincts don't sum) —
    # one extra count_distinct scan is the honest audit price
    total = (
        daily.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx")
        )
        .crossJoin(ev.agg(F.count_distinct("user_id").alias("exact_users")))
        .select(
            F.lit(None).cast("timestamp").alias("bucket"),
            "exact_users",
            F.when(
                F.col("exact_users") == 0,
                F.col("approx").isNull() | (F.col("approx") == 0),
            )
            .otherwise(
                F.abs(F.col("approx") - F.col("exact_users"))
                <= bound * F.col("exact_users")
            )
            .alias("within_bound"),
        )
    )
    return per_day.unionByName(total)


def event_transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    stream: counts and row-normalized probabilities of event_type →
    next event_type. The per-user lag window and nothing else touches
    the raw stream; the transition aggregate is |types|² rows. The
    probability is one double divide of two exact counts (window
    keyed on user_id; transition agg reshuffles |users|·|types|²
    partial rows at most — type-domain-sized, not event-sized).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_from = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        (
            F.col("n").cast("double") / F.sum("n").over(w_from).cast("double")
        ).alias("p"),
    )


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: signup → click → purchase, counting users who
    reached each stage IN ORDER (a later stage counts only after the
    user's FIRST completion of the previous one).

    ONE scan, two aggregates, zero joins: per user, collect the
    (sorted) click and purchase timestamps next to the first signup
    time, then resolve "first click after t1" / "first purchase after
    t2" as array expressions — the conditional-min threshold logic
    runs inside a row, not as a join. The per-user arrays are bounded
    by that user's event count per stage type; for entities with
    unbounded histories the join formulation (this function's r5
    first draft — 6 scans of the event table) trades scans for
    memory, and a min-above-threshold sketch is the streaming form.
    The 3-row summary falls out of one stack() unpivot. PLANS.md
    motivated the rewrite: the declarative union of three stage
    counts re-scanned events six times; this shape scans once.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t1"),
        F.sort_array(
            F.collect_list(F.when(F.col("event_type") == "click", F.col("ts")))
        ).alias("clicks"),
        F.sort_array(
            F.collect_list(F.when(F.col("event_type") == "purchase", F.col("ts")))
        ).alias("purchases"),
    )
    t1 = F.col("t1")
    t2 = F.array_min(F.filter(F.col("clicks"), lambda c: c > t1))
    t3_src = F.array_min(F.filter(F.col("purchases"), lambda p: p > F.col("t2")))
    staged = per_user.withColumn("t2", t2).withColumn("t3", t3_src)
    counts = staged.agg(
        F.count("t1").alias("c1"),
        F.count("t2").alias("c2"),
        F.count("t3").alias("c3"),
    )
    return counts.select(
        F.expr(
            "stack(3, '1_signup', c1, '2_click_after_signup', c2, "
            "'3_purchase_after_click', c3) AS (stage, users)"
        )
    )


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-activity week,
    counted in each subsequent week they were active. Two aggregates:
    per-user first week (one shuffle on user_id), then distinct
    (user, week) activity joined to the cohort map — the standard
    cohort triangle, |weeks|² output rows. retained is exact distinct
    counting; the rate is one double divide.
    """
    ev = load_table(spark, sf_dir, "events")
    wk = lambda c: F.date_trunc("week", c)  # noqa: E731
    # ONE event scan (PLANS.md caught the first draft's three): the
    # cohort week derives from the distinct activity set via a
    # per-user window — date_trunc is monotone, so trunc(min ts) ==
    # min(trunc ts) — and cohort SIZES read off the aggregated grid
    # itself: every user is active in their cohort week by
    # construction, so the week_offset-0 cell IS the cohort size.
    active = ev.select("user_id", wk(F.col("ts")).alias("activity_week")).distinct()
    w_user = Window.partitionBy("user_id")
    coh = active.withColumn(
        "cohort_week", F.min("activity_week").over(w_user)
    )
    grid = coh.groupBy("cohort_week", "activity_week").agg(
        F.count(F.lit(1)).alias("retained")
    )
    # sizes via a window over the (weeks²-sized) grid — a self-join
    # would re-derive the whole grid chain a second time
    w_cohort = Window.partitionBy("cohort_week")
    grid = grid.withColumn(
        "cohort_users",
        F.max(
            F.when(F.col("activity_week") == F.col("cohort_week"), F.col("retained"))
        ).over(w_cohort),
    )
    return grid.select(
        "cohort_week",
        "activity_week",
        (
            (
                F.unix_timestamp("activity_week") - F.unix_timestamp("cohort_week")
            )
            / F.lit(7 * 24 * 3600)
        )
        .cast("int")
        .alias("week_offset"),
        "retained",
        "cohort_users",
        (F.col("retained").cast("double") / F.col("cohort_users").cast("double")).alias(
            "retention_rate"
        ),
    )


def grouping_sets_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((returnflag), (linestatus)): the two
    independent one-dimension summaries in one pass — the
    non-hierarchical subset neither ROLLUP (prefix-only) nor CUBE
    (all 2^n sets, wasteful when only two are wanted) expresses.
    Spark plans it as a single expand + aggregate: one shuffle for
    any number of sets, same as the cube/rollup twins.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS count_order
        FROM {li}
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """,
        li=li,
    )


# --- count-min sketch heavy hitters -----------------------------------
# The frequency analog of the HLL rollup: re-mergeable per-day count
# sketches whose estimates never undercount. Dimensioned so collisions
# actually occur at test scale (true key domain ≈ stations × types ≫ w
# at sf0.1) — the overcount path is exercised, not just the identity.
CMS_DEPTH = 4  # independent hash rows
CMS_WIDTH = 64  # counters per row
_CMS_HEX = "0123456789abcdef"


def _cms_bucket(key_col, depth_col):
    """Portable bucket: first 8 md5 nibbles of 'cms<d>:<key>' mod w —
    the repo's engine-exact hash idiom (no xxhash in DuckDB, no
    DuckDB hash() in Spark)."""
    digest = F.md5(
        F.concat(F.lit("cms"), depth_col.cast("string"), F.lit(":"), key_col)
    )
    return (
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("long") % CMS_WIDTH
    ).alias("bucket")


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimates, built RE-MERGEABLY: one
    grouped agg produces per-DAY (depth, bucket) counter cells, a
    second domain-sized agg sums the daily sketches into the global
    sketch — the same partial-recomposition contract as
    hll_user_rollup, but for point frequencies (Cormode &
    Muthukrishnan's CM sketch): est(key) = min over depths of
    cell[d][h_d(key)], and est ≥ true count always, by construction.

    Because the hashes are the portable md5 idiom, the ESTIMATES
    themselves are engine-exact — the DuckDB oracle reproduces every
    overcount bit-for-bit, a stronger verdict than a within-bound
    boolean. Output: every (station, type) key with its exact count
    and its sketch estimate.

    Scale shape: sketch build is ONE shuffle from events to
    depth × width ≈ 256 cells (map-side partial counts); the merged
    sketch is broadcast into the estimate join (cells ≪ keys); exact
    counts ride one more grouped agg — at 100 TB the sketch is the
    production path and the exact column is the audit, computable
    only at test scale.
    """
    ev = load_table(spark, sf_dir, "events")
    key = F.concat(
        F.col("user_id").cast("string"), F.lit(":"), F.col("event_type")
    ).alias("key")
    depths = F.explode(
        F.array([F.lit(d) for d in range(CMS_DEPTH)])
    ).alias("depth")
    # per-day partial sketches → merged global sketch (re-merge step)
    daily_cells = (
        ev.select(F.date_trunc("day", "ts").alias("day"), key)
        .select("day", "key", depths)
        .groupBy("day", "depth", _cms_bucket(F.col("key"), F.col("depth")))
        .count()
    )
    cells = daily_cells.groupBy("depth", "bucket").agg(
        F.sum("count").alias("c")
    )
    keys = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    probes = keys.select(
        "user_id",
        "event_type",
        "n_exact",
        F.concat(
            F.col("user_id").cast("string"), F.lit(":"), F.col("event_type")
        ).alias("key"),
    ).select("user_id", "event_type", "n_exact", "key", depths)
    est = (
        probes.withColumn("bucket", _cms_bucket(F.col("key"), F.col("depth")))
        .join(F.broadcast(cells), ["depth", "bucket"])
        .groupBy("user_id", "event_type", "n_exact")
        .agg(F.min("c").cast("bigint").alias("n_est"))
    )
    return est.select("user_id", "event_type", "n_exact", "n_est")


def cms_oracle_sql() -> str:
    """DuckDB twin: identical md5-nibble buckets, identical min-over-
    depths arithmetic (the daily/merge split collapses — summing daily
    cell counts equals counting directly)."""
    digest = "md5('cms' || CAST(d AS VARCHAR) || ':' || k)"
    nibbles = " + ".join(
        f"(strpos('{_CMS_HEX}', substr({digest}, {i + 1}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"""
        WITH ev AS (
            SELECT CAST(user_id AS VARCHAR) || ':' || event_type AS k,
                   user_id, event_type
            FROM events
        ), cells AS (
            SELECT d, ({nibbles}) % {CMS_WIDTH} AS bucket,
                   COUNT(*) AS c
            FROM ev CROSS JOIN (SELECT unnest(range({CMS_DEPTH})) AS d)
            GROUP BY 1, 2
        ), keys AS (
            SELECT user_id, event_type,
                   CAST(user_id AS VARCHAR) || ':' || event_type AS k,
                   COUNT(*) AS n_exact
            FROM ev GROUP BY 1, 2, 3
        ), probes AS (
            SELECT keys.*, d, ({nibbles}) % {CMS_WIDTH} AS bucket
            FROM keys CROSS JOIN (SELECT unnest(range({CMS_DEPTH})) AS d)
        )
        SELECT p.user_id, p.event_type,
               CAST(p.n_exact AS BIGINT) AS n_exact,
               CAST(MIN(c.c) AS BIGINT) AS n_est
        FROM probes p JOIN cells c ON p.d = c.d AND p.bucket = c.bucket
        GROUP BY 1, 2, 3
    """


HIST_BIN_WIDTH = 1.0  # value-domain units; quantile error <= width/2


def histogram_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-mergeable fixed-bin histogram sketch for quantiles — the
    family's third sketch after HLL (distincts) and count-min
    (frequencies): exact quantiles need a full sort of the raw data,
    but a histogram of floor(value/w) bins is ONE map-side-combinable
    aggregate whose partial states (per event_type × day here) merge
    by adding counts. The merged sketch answers any quantile with
    error <= w/2 by construction: the rank-r order statistic provably
    sits inside the first bin whose cumulative count reaches
    r = ceil(q*n), and the midpoint estimate can't miss it by more
    than half a bin.

    Quantitative-oracle form (same pattern as hll_user_rollup): every
    arithmetic step — binning, cumulative crossing, ceil(q*n) rank,
    midpoint — is deterministic integer/IEEE math that DuckDB
    reproduces bit-for-bit, and each row also carries the EXACT
    discrete quantile (a raw data value, no arithmetic) plus the
    within-bound verdict, so the driver hash checks the sketch's
    error contract, not just its shape. The exact columns are the
    audit side: at 100 TB they'd be dropped and only the sketch path
    would run (daily states are ~bins-sized, the merge touches no raw
    rows); the audit's per-type row_number sort is the one
    deliberately-unscalable piece, exactly like hll's one extra
    count_distinct scan.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("day", "ts").alias("day"), "value"
    )
    # the sketch: per (type, day) partial states, then the re-merge
    daily = ev.groupBy(
        "event_type", "day", F.floor(F.col("value") / HIST_BIN_WIDTH).alias("bin")
    ).agg(F.count(F.lit(1)).alias("c"))
    merged = daily.groupBy("event_type", "bin").agg(F.sum("c").alias("c"))
    totals = merged.groupBy("event_type").agg(F.sum("c").alias("n"))
    w_cum = Window.partitionBy("event_type").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = merged.withColumn("cum", F.sum("c").over(w_cum)).join(totals, "event_type")
    r50 = F.ceil(F.lit(0.5) * F.col("n"))
    r95 = F.ceil(F.lit(0.95) * F.col("n"))
    est = cum.groupBy("event_type").agg(
        F.min(F.when(F.col("cum") >= r50, F.col("bin"))).alias("bin50"),
        F.min(F.when(F.col("cum") >= r95, F.col("bin"))).alias("bin95"),
    )
    # exact discrete quantiles: rank-r order statistics (audit side)
    w_rank = Window.partitionBy("event_type").orderBy("value")
    ranked = ev.withColumn("rn", F.row_number().over(w_rank)).join(
        totals, "event_type"
    )
    exact = ranked.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") == r50, F.col("value"))).alias("p50_disc"),
        F.max(F.when(F.col("rn") == r95, F.col("value"))).alias("p95_disc"),
    )
    half = HIST_BIN_WIDTH / 2.0
    mid = lambda b: b * F.lit(HIST_BIN_WIDTH) + F.lit(half)  # noqa: E731
    return (
        totals.join(est, "event_type")
        .join(exact, "event_type")
        .select(
            "event_type",
            "n",
            "p50_disc",
            mid(F.col("bin50")).alias("p50_est"),
            (F.abs(mid(F.col("bin50")) - F.col("p50_disc")) <= half).alias(
                "p50_ok"
            ),
            "p95_disc",
            mid(F.col("bin95")).alias("p95_est"),
            (F.abs(mid(F.col("bin95")) - F.col("p95_disc")) <= half).alias(
                "p95_ok"
            ),
        )
    )


BUCKETED_JOIN_BUCKETS = 8


def bucketed_join_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-bucketed co-located join — the write-time answer to the
    repo's most-repeated scale claim: orders⋈lineitem shuffles both
    sides on orderkey UNLESS both tables were bucketed on it when
    written, in which case the bucket layout satisfies the join's
    (and the downstream groupBy's) required distribution and the scan
    feeds the sort-merge join with NO Exchange at all. At 100 TB the
    fact-table shuffle is THE dominant cost of every such query;
    bucketing pays it once at ingest and amortizes it over every
    subsequent join on the key. This entry does the full roundtrip
    per invocation — bucketBy writes of both sides, metastore
    registration, exchange-free join, per-order rollup — and
    `tests/test_bucketing.py` pins the no-Exchange plan property.

    Broadcast is disabled for the join ONLY via a scoped conf so the
    plan exercises the bucketed SMJ path (a broadcast join would also
    skip the shuffle, but stops being available the moment the dim
    side outgrows the driver; bucketing is the strategy that survives
    both sides growing).
    """
    import shutil
    from urllib.parse import urlparse

    sf_tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    t_orders, t_lineitem = f"orders_bj_{sf_tag}", f"lineitem_bj_{sf_tag}"
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in (t_orders, t_lineitem):
        # DROP alone is not enough: a FRESH session's in-memory
        # catalog has no such table, so DROP no-ops while the managed
        # location from a previous session still exists on disk and
        # saveAsTable fails with LOCATION_ALREADY_EXISTS
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
    load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ).write.bucketBy(BUCKETED_JOIN_BUCKETS, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable(t_orders)
    load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    ).write.bucketBy(BUCKETED_JOIN_BUCKETS, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").saveAsTable(t_lineitem)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(t_lineitem)
            .join(
                spark.table(t_orders),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderkey", "o_custkey")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                dec_sum("l_quantity").alias("sum_qty"),
            )
        )
        # materialize while the scoped conf is active: the returned
        # frame reads checkpointed blocks, so restoring the conf can't
        # re-plan the join behind the caller's back
        return joined.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
