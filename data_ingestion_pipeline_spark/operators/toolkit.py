"""Timeseries-toolkit operators over the events hypertable analog.

The reference stores readings in TimescaleDB (`migrations/db.sql:1-40`
creates the hypertable) but its query service exposes only avg/min/
max/count and time_bucket (`services/query/main.py:262-354`). Any
TimescaleDB user has the toolkit aggregates one `CREATE EXTENSION`
away, so a drop-in engine needs the canonical ones: OHLC
(candlestick_agg), gap-fill with linear interpolation
(time_bucket_gapfill + interpolate), time-weighted average
(time_weight), heartbeat/uptime (heartbeat_agg), reset-aware
counters (counter_agg), and LTTB downsampling (lttb).

All but LTTB are pure `pyspark.sql.functions` chains — single scan,
map-side partial aggregation, one shuffle on the station key (the
window operators reuse the same user_id partitioning, so the agg and
the window share one exchange). Cross-engine exactness follows the
repo-wide rules (functions/exact.py): averages are exact decimal
sums; open/close ties break on (ts, event_id); duration arithmetic
stays integer until the final ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.functions.exact import dec_avg
from data_ingestion_pipeline_spark.sources.tables import load_table, spread_scan

# heartbeat horizon: one reading keeps a station "live" for 15 min
HEARTBEAT_SECONDS = 900


def timeseries_ohlc_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC candlestick per station — candlestick_agg analog.

    open/close are the first/last reading of the bucket; ties on ts
    break deterministically on event_id via min/max of a
    (ts, event_id, value) struct — an ordinary partial-aggregable
    min/max, so the plan is scan → partial agg → one shuffle on
    (user_id, bucket) → final agg. No window, no second exchange.
    """
    ev = load_table(spark, sf_dir, "events")
    first_s = F.min(F.struct("ts", "event_id", "value"))
    last_s = F.max(F.struct("ts", "event_id", "value"))
    return (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            first_s.getField("value").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            last_s.getField("value").alias("close"),
            F.count(F.lit(1)).alias("n_readings"),
        )
    )


def timeseries_1h_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series with LINEAR interpolation — the
    `time_bucket_gapfill + interpolate` analog (the locf variant is
    queries.timeseries_1h_gapfill).

    Same scale shape as the locf gapfill: the hour grid explodes from
    one (lo, hi) row per station, and the fill windows share the
    user_id shuffle key with the grid join. Interpolation weights are
    integer epoch-second differences divided once — a deterministic
    per-row IEEE expression, identical across engines, so the result
    hash-matches the oracle despite being float arithmetic. Missing
    buckets always have a known value on BOTH sides (the grid spans
    min..max of observed buckets), so no boundary guards are needed;
    coalesce keeps observed values bit-identical to the exact
    decimal hourly aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.col("user_id"), F.date_trunc("hour", "ts").alias("bucket")
    ).agg(dec_avg("value").alias("avg_value"))

    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "user_id",
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 hour"))
            ).alias("bucket"),
        )
    )
    joined = grid.join(hourly, ["user_id", "bucket"], "left")

    avg = F.col("avg_value")
    # both lookups are RUNNING frames ([unboundedPreceding, -1]): the
    # "next known value" uses a descending sort instead of a
    # [1, unboundedFollowing] frame — Spark evaluates an
    # unbounded-FOLLOWING frame by rescanning the partition tail for
    # every row (O(n²) per station; measured 21 s vs 1.3 s for the
    # locf twin at sf0.1), while a running frame is incremental O(n).
    # Cost: one extra per-station sort, both sharing the user_id
    # exchange.
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy(F.col("bucket").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_v = F.last(avg, ignorenulls=True).over(w_prev)
    prev_b = F.last(F.when(avg.isNotNull(), F.col("bucket")), ignorenulls=True).over(
        w_prev
    )
    next_v = F.last(avg, ignorenulls=True).over(w_next)
    next_b = F.last(F.when(avg.isNotNull(), F.col("bucket")), ignorenulls=True).over(
        w_next
    )
    frac = (F.unix_timestamp(F.col("bucket")) - F.unix_timestamp(prev_b)).cast(
        "double"
    ) / (F.unix_timestamp(next_b) - F.unix_timestamp(prev_b)).cast("double")
    interp = prev_v + (next_v - prev_v) * frac
    return joined.select(
        "user_id",
        "bucket",
        F.coalesce(avg, interp).alias("avg_value"),
        avg.isNull().alias("interpolated"),
    )


def station_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per station — `time_weight('LOCF')`
    analog: each reading holds until the next one, so its weight is
    the seconds to the successor; the last reading weighs nothing.

    twa = Σ value_i · Δt_i / Σ Δt_i over consecutive pairs. The
    weighted sum is exact decimal arithmetic — value as
    DECIMAL(18,6) times Δt as DECIMAL(12,0) (seconds; 12 digits spans
    ~30k years) is an exact DECIMAL(31,6) product, summed exactly —
    and the denominator is the integer observed span, so the single
    final double division is deterministic across engines. One scan;
    the lead() window and the groupBy share the user_id shuffle key.
    Stations with a zero span (all readings simultaneous) are
    excluded rather than dividing by zero.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dt = (F.unix_timestamp(F.lead("ts").over(w)) - F.unix_timestamp("ts")).alias("dt")
    paired = ev.select("user_id", "value", dt)
    weighted = (
        F.col("value").cast("decimal(18,6)") * F.col("dt").cast("decimal(12,0)")
    ).cast("decimal(38,6)")
    return (
        paired.groupBy("user_id")
        .agg(
            F.sum(weighted).alias("wsum"),
            F.sum("dt").alias("span_seconds"),
            F.count(F.lit(1)).alias("n_readings"),
        )
        .filter(F.col("span_seconds") > 0)
        .select(
            "user_id",
            (F.col("wsum").cast("double") / F.col("span_seconds").cast("double")).alias(
                "twa_value"
            ),
            "span_seconds",
            "n_readings",
        )
    )


def station_uptime_heartbeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uptime ratio per station — heartbeat_agg analog: each reading
    keeps the station live for HEARTBEAT_SECONDS or until the next
    reading, whichever comes first; the final reading contributes the
    full horizon.

    alive = Σ least(Δt, H), span = (max ts − min ts) + H, where the
    final reading's missing Δt coalesces to the full horizon (an
    explicit COALESCE — both engines' LEAST would silently skip the
    null, which reads as an accident and double-counts if a `+ H`
    term is added on top). Every intermediate is integer seconds; the
    only float op is the final ratio — deterministic across engines.
    Same single-shuffle shape as the TWA: window and aggregate share
    the user_id key.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dt = (F.unix_timestamp(F.lead("ts").over(w)) - F.unix_timestamp("ts")).alias("dt")
    paired = ev.select("user_id", "ts", dt)
    h = F.lit(HEARTBEAT_SECONDS)
    return (
        paired.groupBy("user_id")
        .agg(
            F.sum(F.least(F.coalesce(F.col("dt"), h), h)).alias("alive_seconds"),
            (
                F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")) + h
            ).alias("span_seconds"),
            F.count(F.lit(1)).alias("n_readings"),
        )
        .select(
            "user_id",
            "alive_seconds",
            "span_seconds",
            (
                F.col("alive_seconds").cast("double")
                / F.col("span_seconds").cast("double")
            ).alias("uptime_ratio"),
            "n_readings",
        )
    )


LTTB_POINTS = 50  # downsampled points per station


def lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling per station — the
    toolkit `lttb()` analog (Steinarsson 2013), picking the
    LTTB_POINTS visually-dominant readings of each station's series.

    LTTB is inherently sequential (each pick maximizes the triangle
    with the PREVIOUS pick and the next bucket's centroid), so this
    is a real per-group Python operator: grouped `applyInPandas`,
    Arrow-batched, parallel ACROSS stations with the sequential loop
    confined to one station's series. That per-entity layout is the
    standard scale contract for downsampling (one station's history
    fits a worker; billions of stations spread over the cluster), and
    the loop itself runs over LTTB_POINTS buckets with the inner
    area computation vectorized per bucket. Ties inside a bucket
    break to the earliest (ts, event_id) — deterministic under any
    partitioning, which the rows-only registry evidence's pytest
    twin asserts against an independent pure-Python LTTB.
    """
    # spread (guide §2.5): the grouped Python stage otherwise inherits
    # AQE's BYTE-sized post-shuffle partitions — tiny input coalesces
    # to 1-2 partitions and the per-station LTTB loops run near-serial.
    # The explicit key repartition pins the exchange width (same
    # exchange the groupBy needs — not an extra one) and is a no-op at
    # production scan widths.
    ev = spread_scan(
        spark,
        load_table(spark, sf_dir, "events").select(
            "user_id", "ts", "event_id", "value"
        ),
        f"{sf_dir}/events.parquet",
        "user_id",
    )
    schema = "user_id bigint, ts timestamp, value double, pick int"

    def fn(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        n, k = len(pdf), LTTB_POINTS
        if n <= k:
            out = pdf[["user_id", "ts", "value"]].copy()
            out["pick"] = np.arange(n, dtype=np.int32)
            return out
        x = pdf["ts"].astype("int64").to_numpy().astype(np.float64)
        y = pdf["value"].to_numpy().astype(np.float64)
        # bucket edges over the middle n-2 points, k-2 buckets:
        # ⌊i·(n-2)/(k-2)⌋+1 in INTEGER arithmetic is exact and
        # strictly increasing whenever n > k, so every bucket is
        # non-empty — a linspace().round() construction can collapse
        # adjacent edges (half-to-even) and feed argmax an empty
        # slice, and float multiplication can drop the last edge
        edges = (
            np.arange(k - 1, dtype=np.int64) * (n - 2) // (k - 2) + 1
        )  # len k-1, edges[i]..edges[i+1] is bucket i; edges[-1] = n-1
        idx = [0]
        a = 0
        for b in range(k - 2):
            lo, hi = edges[b], edges[b + 1]
            nlo, nhi = (edges[b + 1], edges[b + 2]) if b + 2 < len(edges) else (
                edges[b + 1],
                np.int64(n),
            )
            cx, cy = x[nlo:nhi].mean(), y[nlo:nhi].mean()
            area = np.abs(
                (x[a] - cx) * (y[lo:hi] - y[a]) - (x[a] - x[lo:hi]) * (cy - y[a])
            )
            a = int(lo + area.argmax())  # argmax ties → earliest index
            idx.append(a)
        idx.append(n - 1)
        out = pdf.iloc[idx][["user_id", "ts", "value"]].copy()
        out["pick"] = np.arange(len(idx), dtype=np.int32)
        return out

    return ev.groupBy("user_id").applyInPandas(fn, schema)


def station_counter_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reset-aware counter aggregation per station — counter_agg
    analog: readings are treated as a monotonically-increasing
    counter that occasionally restarts (process restart, device
    reboot). A negative step is a reset: the reading itself is the
    post-reset accumulation, so it contributes its own value; a
    non-negative step contributes the delta. total = Σ contributions
    over consecutive pairs, plus the reset count.

    Exactness: each per-row contribution is one IEEE subtraction (or
    a copy) — deterministic across engines — quantized once to
    DECIMAL(38,6) and summed exactly (the repo-wide
    quantize-then-exact-sum rule). Same single-exchange shape as the
    TWA: the lag() window and the aggregate share the user_id key.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    delta = F.col("value") - F.lag("value").over(w)
    contrib = F.when(delta < 0, F.col("value")).otherwise(delta)
    paired = ev.select(
        "user_id",
        contrib.cast("decimal(38,6)").alias("contrib"),
        (delta < 0).cast("int").alias("is_reset"),
    )
    return paired.groupBy("user_id").agg(
        F.coalesce(F.sum("contrib").cast("double"), F.lit(0.0)).alias(
            "counter_total"
        ),
        F.coalesce(F.sum("is_reset"), F.lit(0)).cast("bigint").alias("resets"),
        F.count(F.lit(1)).alias("n_readings"),
    )


def station_variance_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance/stddev per station computed by RE-AGGREGATING
    daily (n, Σx, Σx²) partials — the stats_agg two-level rollup for
    the second moment, the same continuous-aggregate recomposition
    rollup_multires_1d proves for averages.

    Exactness: x as DECIMAL(18,6) squares to an exact DECIMAL(37,12);
    both moment sums are exact decimal arithmetic, so the coarse
    re-aggregation is bit-identical to summing the raw data directly
    — which is what the single-level oracle computes. The final
    variance is ONE double expression over those exact totals,
    parenthesized identically in the oracle:
    (n·Σx² − (Σx)²) / (n·(n−1)). Stations with a single reading are
    excluded (sample variance undefined). Two shuffles: fine partials
    on (station, day), coarse on station — at 100 TB the fine rollup
    is the continuously-maintained table and this query reads it,
    never the raw events.
    """
    ev = load_table(spark, sf_dir, "events")
    xd = F.col("value").cast("decimal(18,6)")
    fine = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("s"),
        F.sum(xd * xd).alias("s2"),
    )
    coarse = fine.groupBy("user_id").agg(
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.sum("s2").alias("s2"),
    )
    n_d = F.col("n").cast("double")
    s_d = F.col("s").cast("double")
    s2_d = F.col("s2").cast("double")
    var = (n_d * s2_d - s_d * s_d) / (n_d * (n_d - F.lit(1.0)))
    return (
        coarse.filter(F.col("n") > 1)
        .select(
            "user_id",
            "n",
            (s_d / n_d).alias("mean_value"),
            var.alias("var_value"),
            F.sqrt(var).alias("stddev_value"),
        )
    )


def _idiv(a: F.Column, b) -> F.Column:
    """Exact integer division for non-negative longs: (a − a mod b)/b.
    Avoids float-floor edge cases; every intermediate is an exact
    integer-valued double."""
    return ((a - F.pmod(a, F.lit(b))) / F.lit(b)).cast("long")


def lttb_structure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantitative structural audit of lttb_downsample — the
    SQL-checkable contract of the (inherently sequential) LTTB pick:

    - per station, exactly min(n, LTTB_POINTS) picks;
    - pick 0 is the series' first point and the last pick its last
      (by the same (ts, event_id) order) — ts/value emitted and
      hash-checked;
    - when n ≤ LTTB_POINTS every point is its own pick (all emitted);
    - every middle pick falls inside ITS bucket — index range
      [⌊(p−1)(n−2)/(k−2)⌋+1, ⌊p(n−2)/(k−2)⌋+1), the operator's own
      integer edges — certified by the verdict column (the triangle
      choice INSIDE the bucket is pinned by the pure-Python pytest
      twin; it is not SQL-expressible).

    Output: (user_id, pick, n_points, sel_ts, sel_value, ok); sel_*
    are NULL exactly where the sequential choice is not SQL-derivable
    (middle picks of long series). The DuckDB oracle reproduces all
    non-verdict values and asserts ok."""
    k = LTTB_POINTS
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = (
        ev.withColumn("idx", (F.row_number().over(w) - 1).cast("long"))
        .withColumn(
            "n",
            F.count(F.lit(1)).over(Window.partitionBy("user_id")).cast("long"),
        )
        .select("user_id", "ts", "value", "idx", "n")
    )
    lt = lttb_downsample(spark, sf_dir)  # user_id, ts, value, pick
    # map picks back to candidate source indices ((ts, value) ties keep
    # every matching idx; the pick is in-bucket if ANY candidate is)
    cand = lt.join(ranked, ["user_id", "ts", "value"])
    p = F.col("pick").cast("long")
    n = F.col("n")
    m = F.least(n, F.lit(k))
    known = (n <= k) | (p == 0) | (p == m - 1)
    lo = (
        F.when(n <= k, p)
        .when(p == 0, F.lit(0).cast("long"))
        .when(p == m - 1, n - 1)
        .otherwise(_idiv((p - 1) * (n - 2), k - 2) + 1)
    )
    hi_excl = (
        F.when(n <= k, p + 1)
        .when(p == 0, F.lit(1).cast("long"))
        .when(p == m - 1, n)
        .otherwise(_idiv(p * (n - 2), k - 2) + 1)
    )
    graded = (
        cand.withColumn(
            "hit", ((F.col("idx") >= lo) & (F.col("idx") < hi_excl)).cast("int")
        )
        .groupBy("user_id", "pick")
        .agg(
            F.max("n").alias("n"),
            F.max("hit").alias("any_hit"),
            F.first("ts").alias("ts"),
            F.first("value").alias("value"),
        )
    )
    known_out = (F.col("n") <= k) | (F.col("pick") == 0) | (
        F.col("pick") == F.least(F.col("n"), F.lit(k)) - 1
    )
    return graded.select(
        "user_id",
        "pick",
        F.col("n").alias("n_points"),
        F.when(known_out, F.col("ts")).alias("sel_ts"),
        F.when(known_out, F.col("value")).alias("sel_value"),
        (F.col("any_hit") == 1).alias("ok"),
    )
