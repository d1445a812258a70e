"""Time-series operators (the reference's domain — InfluxDB 3 data):
gap-fill, last-observation-carried-forward, tolerance-bounded as-of.

All on the ns-long time policy (events.ts), H-checked. Gap-fill's
bucket spine is a driver-built sequence (two scalars collected — the
hour range), never a data-sized collect.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kompactor_spark.queries import register
from kompactor_spark.tables import loader
from kompactor_spark.timeutil import ns_bucket

NS_PER_HOUR = 3_600_000_000_000


# --------------------------------------------------------------------------
# X7 — gap-fill: every (event_type × hour) bucket over the full time
# range, zero-filled where no events landed (dashboards need the empty
# buckets; storage engines never materialize them)
# --------------------------------------------------------------------------
@register(
    "x7_gap_fill",
    oracle=f"""
    WITH bounds AS (
      SELECT (epoch_ns(min(ts)) // {NS_PER_HOUR}) * {NS_PER_HOUR} AS hmin,
             (epoch_ns(max(ts)) // {NS_PER_HOUR}) * {NS_PER_HOUR} AS hmax
      FROM events
    ),
    spine AS (
      SELECT t.event_type, gs.h AS hour_ns
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(generate_series(hmin, hmax, {NS_PER_HOUR})) AS h FROM bounds) gs
    ),
    actual AS (
      SELECT event_type, (epoch_ns(ts) // {NS_PER_HOUR}) * {NS_PER_HOUR} AS hour_ns,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT s.event_type, s.hour_ns, COALESCE(a.n_events, 0) AS n_events
    FROM spine s LEFT JOIN actual a USING (event_type, hour_ns)
    ORDER BY s.event_type, s.hour_ns
    """,
)
def x7_gap_fill(spark, sf_dir):
    T = loader(sf_dir, spark)
    ev = T("events")
    b = ev.agg(
        (F.min("ts") - F.min("ts") % NS_PER_HOUR).alias("hmin"),
        (F.max("ts") - F.max("ts") % NS_PER_HOUR).alias("hmax"),
    ).first()
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(
            spark.range(1).select(
                F.explode(
                    F.sequence(F.lit(int(b["hmin"])), F.lit(int(b["hmax"])), F.lit(NS_PER_HOUR))
                ).alias("hour_ns")
            )
        )
    )
    actual = (
        ev.groupBy(
            "event_type",
            (F.col("ts") - F.col("ts") % NS_PER_HOUR).alias("hour_ns"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )
    return (
        spine.join(actual, ["event_type", "hour_ns"], "left")
        .select("event_type", "hour_ns", F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"))
        .orderBy("event_type", "hour_ns")
    )


# --------------------------------------------------------------------------
# X8 — LOCF (last observation carried forward): sparse readings (every
# 5th event's value nulled to simulate gaps) forward-filled per user in
# event-time order — the canonical sensor-stream interpolation
# --------------------------------------------------------------------------
@register(
    "x8_locf",
    oracle="""
    WITH sparse AS (
      SELECT event_id, user_id, epoch_ns(ts) AS ts_ns,
             CASE WHEN event_id % 5 = 0 THEN NULL ELSE round(value, 6) END AS v
      FROM events
    )
    SELECT event_id, user_id, ts_ns, v,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts_ns, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
    FROM sparse
    ORDER BY event_id
    """,
)
def x8_locf(spark, sf_dir):
    T = loader(sf_dir, spark)
    sparse = T("events").select(
        "event_id",
        "user_id",
        (F.col("ts") - F.col("ts") % 1000).alias("ts_ns"),
        F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(F.round("value", 6)).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return sparse.withColumn("v_filled", F.last("v", ignorenulls=True).over(w)).orderBy("event_id")


# --------------------------------------------------------------------------
# J8b — as-of join with tolerance: latest prior signup of the same
# user, but only if within 24 h of the error (stale matches → NULL) —
# the bounded-lookback variant every time-series store exposes
# --------------------------------------------------------------------------
_TOL = 24 * NS_PER_HOUR


@register(
    "j8b_asof_tolerance",
    oracle=f"""
    SELECT e.event_id, e.user_id, epoch_ns(e.ts) AS err_ts,
           CASE WHEN epoch_ns(e.ts) - epoch_ns(s.ts) <= {_TOL}
                THEN epoch_ns(s.ts) END AS signup_ts
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON e.user_id = s.user_id AND e.ts >= s.ts
    ORDER BY e.event_id
    """,
)
def j8b_asof_tolerance(spark, sf_dir):
    from kompactor_spark.operators.asof import asof_join_split

    T = loader(sf_dir, spark)
    # µs-floor BEFORE the as-of match (the oracle's ASOF predicate runs
    # on µs-truncated timestamps; see j8_asof_join). Both sides split one
    # events scan -> fused single-scan variant.
    ev = T("events").withColumn("ts_us", F.col("ts") - F.col("ts") % 1000)
    joined = asof_join_split(
        ev,
        on="user_id",
        ts="ts_us",
        left_when=F.col("event_type") == "error",
        right_when=F.col("event_type") == "signup",
        left_cols=["event_id"],
        left_ts_name="err_ts",
        right_ts_name="signup_ts_m",
    )
    return joined.select(
        "event_id",
        "user_id",
        "err_ts",
        F.when(F.col("err_ts") - F.col("signup_ts_m") <= _TOL, F.col("signup_ts_m")).alias(
            "signup_ts"
        ),
    ).orderBy("event_id")


# --------------------------------------------------------------------------
# X10 — retention cohorts: users bucketed by first-seen day, active-user
# counts per (cohort_day, days_since). All bucket math is exact ns-long
# arithmetic (day deltas < 2^53, no float loss); presentation converts
# to date strings only at the end.
# --------------------------------------------------------------------------
@register(
    "x10_retention_cohorts",
    oracle="""
    WITH first_day AS (
      SELECT user_id, min(time_bucket(INTERVAL '1 day', ts)) AS cohort_day
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id, time_bucket(INTERVAL '1 day', ts) AS active_day
      FROM events)
    SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', f.cohort_day, a.active_day) AS BIGINT) AS days_since,
           count(*) AS active_users
    FROM first_day f JOIN activity a ON f.user_id = a.user_id
    GROUP BY f.cohort_day, date_diff('day', f.cohort_day, a.active_day)
    ORDER BY cohort_day, days_since
    """,
)
def x10_retention_cohorts(spark, sf_dir):
    from kompactor_spark.timeutil import NS_PER_DAY, ns_bucket, ns_to_timestamp

    T = loader(sf_dir, spark)
    ev = T("events").select("user_id", ns_bucket(F.col("ts"), NS_PER_DAY).alias("day_ns"))
    first = ev.groupBy("user_id").agg(F.min("day_ns").alias("cohort_ns"))
    activity = ev.distinct()
    return (
        activity.join(first, "user_id")
        .groupBy(
            "cohort_ns",
            # exact long division: the day-floored diff is < 2^53 here,
            # but at multi-year ranges the double detour would round —
            # same discipline as x28's hod.
            F.expr(f"(day_ns - cohort_ns) div {NS_PER_DAY}").alias("days_since"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
        .select(
            F.date_format(ns_to_timestamp(F.col("cohort_ns")), "yyyy-MM-dd").alias("cohort_day"),
            "days_since",
            "active_users",
        )
        .orderBy("cohort_day", "days_since")
    )


# --------------------------------------------------------------------------
# X11 — counter rate (InfluxDB DERIVATIVE shape): per-series delta of
# value over delta of time between consecutive samples. Timestamps are
# µs-floored longs on both sides; the only double op is the final
# division, identical IEEE in both engines.
# --------------------------------------------------------------------------
@register(
    "x11_counter_rate",
    oracle="""
    WITH s AS (
      SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us, value
      FROM events WHERE event_type = 'purchase')
    SELECT user_id, event_id, ts_us,
           -- "+ 0.0" folds IEEE -0.0 (DuckDB round() keeps the sign bit;
           -- Spark's BigDecimal round cannot) into +0.0 on both engines
           round((value - lag(value) OVER w)
                 / (CAST(ts_us - lag(ts_us) OVER w AS DOUBLE) / 1000000.0), 6) + 0.0 AS rate_per_s
    FROM s
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ORDER BY user_id, ts_us, event_id
    """,
)
def x11_counter_rate(spark, sf_dir):
    from pyspark.sql import Window

    T = loader(sf_dir, spark)
    s = (
        T("events")
        .where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            # integer div: a float path would round the ~1.7e18 ns epoch
            # (> 2^53) before dividing — reference bug B3's failure class
            F.expr("ts div 1000").cast("long").alias("ts_us"),
            "value",
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    dt = (F.col("ts_us") - F.lag("ts_us").over(w)).cast("double") / F.lit(1_000_000.0)
    return (
        s.withColumn(
            "rate_per_s",
            F.round((F.col("value") - F.lag("value").over(w)) / dt, 6) + F.lit(0.0),
        )
        .select("user_id", "event_id", "ts_us", "rate_per_s")
        .orderBy("user_id", "ts_us", "event_id")
    )


# --------------------------------------------------------------------------
# X12 — hierarchical time rollup: one pass produces day, month, year,
# and grand-total aggregates via ROLLUP(y, m, d) — the continuous-
# aggregate ladder a time-series store materializes (hour→day→month
# generations, reference D4/D8 intent at query level). Partial
# aggregation makes the multi-level pass one shuffle, not three.
# --------------------------------------------------------------------------
@register(
    "x12_time_rollup_hierarchy",
    oracle="""
    SELECT CAST(date_part('year', ts) AS INT) AS y,
           CAST(date_part('month', ts) AS INT) AS m,
           CAST(date_part('day', ts) AS INT) AS d,
           CAST(GROUPING(date_part('year', ts)) AS INTEGER) AS g_y,
           CAST(GROUPING(date_part('month', ts)) AS INTEGER) AS g_m,
           CAST(GROUPING(date_part('day', ts)) AS INTEGER) AS g_d,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY ROLLUP (date_part('year', ts), date_part('month', ts), date_part('day', ts))
    ORDER BY g_y, g_m, g_d,
             y NULLS FIRST, m NULLS FIRST, d NULLS FIRST
    """,
)
def x12_time_rollup_hierarchy(spark, sf_dir):
    # events.ts is an ns-long; both engines see identical µs instants
    # (DuckDB truncates Parquet ns→µs, `ts div 1000` truncates the same
    # way), so calendar parts agree exactly.
    T = loader(sf_dir, spark)
    ev = T("events").withColumn(
        "ts_us", F.timestamp_micros(F.expr("ts div 1000").cast("long"))
    )
    return (
        ev.select(
            F.year("ts_us").alias("y"),
            F.month("ts_us").alias("m"),
            F.dayofmonth("ts_us").alias("d"),
            "value",
        )
        .rollup("y", "m", "d")
        .agg(
            F.grouping("y").cast("int").alias("g_y"),
            F.grouping("m").cast("int").alias("g_m"),
            F.grouping("d").cast("int").alias("g_d"),
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .orderBy(
            "g_y",
            "g_m",
            "g_d",
            F.col("y").asc_nulls_first(),
            F.col("m").asc_nulls_first(),
            F.col("d").asc_nulls_first(),
        )
    )


# --------------------------------------------------------------------------
# X15 — sketch-carrying rollup reuse (continuous-aggregate pattern):
# day-level counts/sums/distincts/medians derived ENTIRELY from the
# hourly rollup — the raw table is scanned once to build it, never at
# query time. Sums re-add exactly; HLL/KLL sketches merge with bounded
# error (asserted vs direct computation in tests/test_rollup.py).
# Sketch estimates are engine-specific → rows-only check.
# --------------------------------------------------------------------------
@register("x15_sketch_rollup", check="T: HLL sketch rollup — sketch bytes engine-specific; tolerance vs exact distinct in tests/")
def x15_sketch_rollup(spark, sf_dir):
    from kompactor_spark.operators.rollup import NS_PER_HOUR, hourly_rollup, reaggregate

    T = loader(sf_dir, spark)
    day = reaggregate(hourly_rollup(T("events")), 24 * NS_PER_HOUR)
    return day.orderBy("bucket_ns", "key")


# --------------------------------------------------------------------------
# W8 — user journey paths: each user's first five event types in time
# order as a '>'-joined path, plus the count of journeys sharing that
# prefix. One shuffle on user_id (groupBy with an ordered struct
# collect — no window pass needed), then a tiny path-level rollup:
# the classic product-analytics "top paths" report.
# --------------------------------------------------------------------------
@register(
    "w8_journey_paths",
    oracle="""
    WITH j AS (
      SELECT user_id,
             array_to_string(list_slice(list(event_type ORDER BY ts, event_id), 1, 5), '>') AS path
      FROM events GROUP BY user_id)
    SELECT path, CAST(count(*) AS BIGINT) AS n_users
    FROM j GROUP BY path ORDER BY n_users DESC, path LIMIT 15
    """,
)
def w8_journey_paths(spark, sf_dir):
    T = loader(sf_dir, spark)
    j = (
        T("events")
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                ">",
                F.slice(
                    F.transform(
                        F.array_sort(
                            # µs-floored sort key — the oracle orders
                            # µs-truncated ts (ADVICE r3 ordering class)
                            F.collect_list(
                                F.struct(
                                    (F.col("ts") - F.col("ts") % 1000).alias("ts"),
                                    "event_id",
                                    "event_type",
                                )
                            )
                        ),
                        lambda s: s.getField("event_type"),
                    ),
                    1,
                    5,
                ),
            ).alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy(F.col("n_users").desc(), "path")
        .limit(15)
    )
    return j


# --------------------------------------------------------------------------
# W9 — event-type transition matrix: per-user lag(event_type) over time
# order, then global (prev → next) counts — the Markov-edge rollup
# behind funnel discovery. One shuffle for the window, partial-agg'd
# count after.
# --------------------------------------------------------------------------
@register(
    "w9_event_transitions",
    oracle="""
    WITH t AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events)
    SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
    FROM t WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    ORDER BY prev_type, next_type
    """,
)
def w9_event_transitions(spark, sf_dir):
    from pyspark.sql import Window

    T = loader(sf_dir, spark)
    # µs-floored ordering key — matches the oracle's µs-truncated ts
    # (ADVICE r3 ordering-sensitivity class)
    w = Window.partitionBy("user_id").orderBy(F.col("ts") - F.col("ts") % 1000, "event_id")
    return (
        T("events")
        .select("user_id", "event_type", F.lag("event_type").over(w).alias("prev_type"))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("prev_type", "next_type")
    )


# --------------------------------------------------------------------------
# X16 — M4 downsampling: per time bucket keep {min, max, first, last}
# of the series (+ their timestamps) — the canonical lossless-plot
# downsample every time-series store ships (InfluxDB/Grafana "M4").
# One groupBy with arg_min/arg_max-style aggregates: a single shuffle,
# map-side partial agg, output = 4 points per bucket regardless of
# input density. events.ts is unique at every sf (asserted by the
# oracle equivalence itself: arg_min over a duplicated ts would be
# nondeterministic on both engines).
# --------------------------------------------------------------------------
@register(
    "x16_m4_downsample",
    oracle=f"""
    SELECT (epoch_ns(ts) // {NS_PER_HOUR}) * {NS_PER_HOUR} AS bucket_ns,
           CAST(count(*) AS BIGINT) AS n,
           round(min(value), 6) AS v_min,
           round(max(value), 6) AS v_max,
           round(arg_min(value, ts), 6) AS v_first,
           round(arg_max(value, ts), 6) AS v_last,
           epoch_ns(min(ts)) AS t_first,
           epoch_ns(max(ts)) AS t_last
    FROM events
    GROUP BY 1
    ORDER BY bucket_ns
    """,
)
def x16_m4_downsample(spark, sf_dir):
    T = loader(sf_dir, spark)
    # min_by/max_by order by the µs-FLOORED ts: the DuckDB oracle only
    # ever sees µs-truncated timestamps, so if a round ships the
    # TIMESTAMP(NANOS) encoding again (it has — round 1), ordering by
    # raw ns here would diverge for events inside one µs (ADVICE r3).
    ts_us = (F.col("ts") - F.col("ts") % 1000).alias("ts_us")
    return (
        T("events")
        .withColumn("ts_us", ts_us)
        .groupBy(ns_bucket(F.col("ts"), NS_PER_HOUR).alias("bucket_ns"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.min("value"), 6).alias("v_min"),
            F.round(F.max("value"), 6).alias("v_max"),
            F.round(F.min_by("value", "ts_us"), 6).alias("v_first"),
            F.round(F.max_by("value", "ts_us"), 6).alias("v_last"),
            F.min("ts_us").alias("t_first"),
            F.max("ts_us").alias("t_last"),
        )
        .orderBy("bucket_ns")
    )


# --------------------------------------------------------------------------
# X17 — gap detection: intervals longer than a threshold between
# consecutive events per user — the sensor-downtime / dead-feed monitor
# (complement of X7's gap-fill: X7 materializes empty buckets, X17
# reports the outages themselves). One lag window = one shuffle on
# user_id; output is only the offending intervals.
# --------------------------------------------------------------------------
_GAP_NS = 2 * NS_PER_HOUR


@register(
    "x17_gap_detect",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, epoch_ns(ts) AS ts_ns,
             lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ns
      FROM events)
    SELECT user_id, prev_ns AS gap_start_ns, ts_ns AS gap_end_ns,
           ts_ns - prev_ns AS gap_ns
    FROM seq
    WHERE prev_ns IS NOT NULL AND ts_ns - prev_ns > {_GAP_NS}
    ORDER BY user_id, gap_start_ns
    """,
)
def x17_gap_detect(spark, sf_dir):
    T = loader(sf_dir, spark)
    us = lambda c: c - c % 1000  # noqa: E731  (µs-floor, ns policy)
    # window orders by the µs-floored ts — the key the oracle actually
    # sorts on (DuckDB reads µs-truncated timestamps); raw-ns ordering
    # would mispair lag() under a TIMESTAMP(NANOS) round (ADVICE r3)
    w = Window.partitionBy("user_id").orderBy(us(F.col("ts")), "event_id")
    seq = T("events").select(
        "user_id",
        us(F.col("ts")).alias("ts_ns"),
        us(F.lag("ts").over(w)).alias("prev_ns"),
    )
    return (
        seq.where(F.col("prev_ns").isNotNull() & (F.col("ts_ns") - F.col("prev_ns") > _GAP_NS))
        .select(
            "user_id",
            F.col("prev_ns").alias("gap_start_ns"),
            F.col("ts_ns").alias("gap_end_ns"),
            (F.col("ts_ns") - F.col("prev_ns")).alias("gap_ns"),
        )
        .orderBy("user_id", "gap_start_ns")
    )


# --------------------------------------------------------------------------
# X18 — rolling z-score anomaly detection (new round 4): per-user
# rolling mean/stddev over a trailing 2-hour RANGE frame, flag samples
# whose |z| ≥ 3 — the classic streaming-monitor outlier rule. One
# window shuffle on user_id; the RANGE frame keeps the state bounded by
# the time horizon, not the row count. The anomaly predicate compares
# the ROUNDED z-score so both engines filter on bit-identical values
# (raw mean/std carry ~1e-15 cross-engine drift; a raw 3σ cut could
# flip boundary rows). `+ 0.0` folds DuckDB's signed zero.
# --------------------------------------------------------------------------
_Z_WIN_NS = 2 * NS_PER_HOUR


@register(
    "x18_rolling_zscore",
    oracle=f"""
    WITH s AS (
      SELECT user_id, event_id, epoch_ns(ts) AS ts_ns, value FROM events),
    w AS (
      SELECT user_id, event_id, ts_ns, value,
             avg(value) OVER win AS mu,
             stddev_samp(value) OVER win AS sd,
             count(*) OVER win AS n_win
      FROM s
      WINDOW win AS (PARTITION BY user_id ORDER BY ts_ns
                     RANGE BETWEEN {_Z_WIN_NS} PRECEDING AND CURRENT ROW))
    SELECT user_id, event_id, ts_ns,
           round(value, 6) AS value,
           round((value - mu) / sd, 6) + 0.0 AS zscore
    FROM w
    WHERE n_win >= 5 AND sd > 0
      AND abs(round((value - mu) / sd, 6) + 0.0) >= 3.0
    ORDER BY user_id, ts_ns, event_id
    """,
)
def x18_rolling_zscore(spark, sf_dir):
    from pyspark.sql import Window

    T = loader(sf_dir, spark)
    s = T("events").select(
        "user_id",
        "event_id",
        (F.col("ts") - F.col("ts") % 1000).alias("ts_ns"),  # µs floor, ns policy
        "value",
    )
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns")
        .rangeBetween(-_Z_WIN_NS, Window.currentRow)
    )
    w = s.select(
        "user_id",
        "event_id",
        "ts_ns",
        "value",
        F.avg("value").over(win).alias("mu"),
        F.stddev_samp("value").over(win).alias("sd"),
        F.count("*").over(win).alias("n_win"),
    )
    z = F.round((F.col("value") - F.col("mu")) / F.col("sd"), 6) + F.lit(0.0)
    return (
        w.where((F.col("n_win") >= 5) & (F.col("sd") > 0) & (F.abs(z) >= 3.0))
        .select(
            "user_id",
            "event_id",
            "ts_ns",
            F.round("value", 6).alias("value"),
            z.alias("zscore"),
        )
        .orderBy("user_id", "ts_ns", "event_id")
    )


# --------------------------------------------------------------------------
# W11 — funnel conversion (new round 4): first signup → first
# subsequent purchase per user, with the 24 h conversion rate and mean
# delay — the two-step funnel every product-analytics store answers.
# Two narrow aggregates + one equi-join on user_id; the final result is
# a single row, so everything after the per-user min() is negligible at
# any scale. All timestamps µs-floored (oracle sees µs).
# --------------------------------------------------------------------------
_FUNNEL_WINDOW_NS = 24 * NS_PER_HOUR


@register(
    "w11_funnel_conversion",
    oracle=f"""
    WITH s AS (
      SELECT user_id, min(epoch_ns(ts)) AS t0
      FROM events WHERE event_type = 'signup' GROUP BY user_id),
    p AS (
      SELECT s.user_id, s.t0, min(epoch_ns(e.ts)) AS t1
      FROM s JOIN events e
        ON e.user_id = s.user_id AND e.event_type = 'purchase'
       AND epoch_ns(e.ts) >= s.t0
      GROUP BY s.user_id, s.t0)
    SELECT CAST((SELECT count(*) FROM s) AS BIGINT) AS n_signup_users,
           CAST(count(*) AS BIGINT) AS n_with_purchase_after,
           CAST(sum(CASE WHEN t1 - t0 <= {_FUNNEL_WINDOW_NS} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_converted_24h,
           round(avg(CAST(t1 - t0 AS DOUBLE) / 3600000000000.0), 6) AS avg_hours_to_purchase
    FROM p
    """,
)
def w11_funnel_conversion(spark, sf_dir):
    T = loader(sf_dir, spark)
    us = lambda c: F.col(c) - F.col(c) % 1000  # noqa: E731
    ev = T("events")
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(us("ts")).alias("t0"))
    )
    pur = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), us("ts").alias("pt")
    )
    p = (
        s.join(pur, (F.col("user_id") == F.col("p_user")) & (F.col("pt") >= F.col("t0")))
        .groupBy("user_id", "t0")
        .agg(F.min("pt").alias("t1"))
    )
    n_signup = s.agg(F.count(F.lit(1)).cast("bigint").alias("n_signup_users"))
    return (
        p.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_with_purchase_after"),
            F.sum(F.when(F.col("t1") - F.col("t0") <= _FUNNEL_WINDOW_NS, 1).otherwise(0))
            .cast("bigint")
            .alias("n_converted_24h"),
            F.round(
                F.avg((F.col("t1") - F.col("t0")).cast("double") / F.lit(3_600_000_000_000.0)), 6
            ).alias("avg_hours_to_purchase"),
        )
        .join(F.broadcast(n_signup))
        .select(
            "n_signup_users", "n_with_purchase_after", "n_converted_24h", "avg_hours_to_purchase"
        )
    )


# --------------------------------------------------------------------------
# X19 — finite-window EWMA (new round 4): exponentially weighted moving
# average over the trailing K=8 samples per user, α=0.5, weights
# renormalized over the samples actually present (series warm-up).
# The infinite-horizon recursive EWMA is order-dependent float state;
# the finite-window form is a FIXED-ORDER dot product of K lag terms,
# so both engines evaluate the identical expression tree and agree
# bit-for-bit before rounding. One window shuffle on user_id; K lag
# slots per row regardless of history length — O(K) state, no
# unbounded frame. (InfluxDB exponential_moving_average /
# PromQL-style smoothing, reimplemented deterministically.)
# --------------------------------------------------------------------------
_EWMA_K = 8
_EWMA_ALPHA = 0.5


def _ewma_weight(k: int) -> float:
    return _EWMA_ALPHA * (1.0 - _EWMA_ALPHA) ** k


@register(
    "x19_ewma",
    oracle=f"""
    WITH s AS (
      SELECT user_id, event_id, epoch_ns(ts) AS ts_ns, value FROM events),
    l AS (
      SELECT user_id, event_id, ts_ns,
             {", ".join(f"lag(value, {k}) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id) AS v{k}" for k in range(_EWMA_K))}
      FROM s)
    SELECT user_id, event_id, ts_ns,
           round((
             {" + ".join(f"COALESCE({_ewma_weight(k)!r} * v{k}, 0.0)" for k in range(_EWMA_K))}
           ) / (
             {" + ".join(f"CASE WHEN v{k} IS NOT NULL THEN {_ewma_weight(k)!r} ELSE 0.0 END" for k in range(_EWMA_K))}
           ), 6) + 0.0 AS ewma
    FROM l
    ORDER BY user_id, ts_ns, event_id
    """,
)
def x19_ewma(spark, sf_dir):
    from pyspark.sql import Window

    T = loader(sf_dir, spark)
    s = T("events").select(
        "user_id",
        "event_id",
        (F.col("ts") - F.col("ts") % 1000).alias("ts_ns"),  # µs floor, ns policy
        "value",
    )
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    lags = s.select(
        "user_id",
        "event_id",
        "ts_ns",
        *[F.lag("value", k).over(w).alias(f"v{k}") for k in range(_EWMA_K)],
    )
    num = F.lit(0.0)
    den = F.lit(0.0)
    # identical left-associated sum order as the oracle SQL above
    for k in range(_EWMA_K):
        num = num + F.coalesce(F.lit(_ewma_weight(k)) * F.col(f"v{k}"), F.lit(0.0))
        den = den + F.when(F.col(f"v{k}").isNotNull(), F.lit(_ewma_weight(k))).otherwise(0.0)
    return (
        lags.select(
            "user_id",
            "event_id",
            "ts_ns",
            (F.round(num / den, 6) + F.lit(0.0)).alias("ewma"),
        )
        .orderBy("user_id", "ts_ns", "event_id")
    )


# --------------------------------------------------------------------------
# X20 — CUSUM drift detection (new round 4): per-user cumulative sum of
# (value − target) in event order — the control-chart statistic whose
# max/min excursions flag level shifts. Target is the declared process
# mean (control charts monitor against a SPEC, which keeps the centering
# deterministic — a data-derived float mean would inject cross-engine
# summation-order drift into every subsequent row). One window shuffle
# on user_id; the running sum folds in frame order on both engines, so
# the trailing float state is bit-identical (same class as w3's running
# frames, driver-green r1).
# --------------------------------------------------------------------------
_CUSUM_TARGET = 0.5


@register(
    "x20_cusum",
    oracle=f"""
    WITH s AS (
      SELECT user_id, epoch_ns(ts) AS ts_ns, event_id, value FROM events),
    c AS (
      SELECT user_id, ts_ns, event_id,
             sum(value - {_CUSUM_TARGET!r}) OVER
               (PARTITION BY user_id ORDER BY ts_ns, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
      FROM s)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n,
           round(max(cusum), 6) + 0.0 AS cusum_max,
           round(min(cusum), 6) + 0.0 AS cusum_min,
           round(arg_max(cusum, ts_ns), 6) + 0.0 AS cusum_final
    FROM c
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def x20_cusum(spark, sf_dir):
    from pyspark.sql import Window

    T = loader(sf_dir, spark)
    s = T("events").select(
        "user_id",
        (F.col("ts") - F.col("ts") % 1000).alias("ts_ns"),
        "event_id",
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = s.select(
        "user_id",
        "ts_ns",
        F.sum(F.col("value") - F.lit(_CUSUM_TARGET)).over(w).alias("cusum"),
    )
    return (
        c.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (F.round(F.max("cusum"), 6) + F.lit(0.0)).alias("cusum_max"),
            (F.round(F.min("cusum"), 6) + F.lit(0.0)).alias("cusum_min"),
            (F.round(F.max_by("cusum", "ts_ns"), 6) + F.lit(0.0)).alias("cusum_final"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# X21 — as-of snapshots / time travel (new round 4): the latest state of
# every user at three snapshot instants spread across the time range —
# the "SELECT ... AS OF τ" read every versioned store answers. The
# snapshot spine is exact integer ns arithmetic (tmin + i·span/4), so
# both engines derive identical τs; the engine computes the two bound
# scalars driver-side (two aggregated values, never data rows — the
# x7 gap-fill pattern) and EXPLODEs each event to the snapshots it
# precedes: an equi-shuffle on (snap_ns, user_id) with map-side
# max_by partials, never a per-snapshot rescan. Fan-out is bounded by
# the snapshot count (≤3 here), so the shuffle stays O(data · snaps)
# at 100 TB with the snapshot loop fully parallel.
# --------------------------------------------------------------------------
@register(
    "x21_asof_snapshot",
    oracle="""
    WITH b AS (
      SELECT min(epoch_ns(ts)) AS tmin, max(epoch_ns(ts)) AS tmax FROM events),
    taus AS (
      SELECT tmin + i * ((tmax - tmin) // 4) AS snap_ns
      FROM b CROSS JOIN (SELECT unnest([1, 2, 3]) AS i))
    SELECT t.snap_ns, e.user_id,
           max(epoch_ns(e.ts)) AS last_ts_ns,
           round(arg_max(e.value, epoch_ns(e.ts)), 6) + 0.0 AS last_value
    FROM events e JOIN taus t ON epoch_ns(e.ts) <= t.snap_ns
    GROUP BY t.snap_ns, e.user_id
    ORDER BY t.snap_ns, e.user_id
    """,
)
def x21_asof_snapshot(spark, sf_dir):
    T = loader(sf_dir, spark)
    ev = T("events").select(
        "user_id",
        (F.col("ts") - F.col("ts") % 1000).alias("ts_us"),
        "value",
    )
    b = ev.agg(F.min("ts_us").alias("tmin"), F.max("ts_us").alias("tmax")).first()
    span4 = (int(b["tmax"]) - int(b["tmin"])) // 4  # exact integer ns math
    taus = [int(b["tmin"]) + i * span4 for i in (1, 2, 3)]
    snaps = F.array(*[F.lit(t) for t in taus])
    return (
        ev.select(
            "user_id",
            "ts_us",
            "value",
            F.explode(F.filter(snaps, lambda s: F.col("ts_us") <= s)).alias("snap_ns"),
        )
        .groupBy("snap_ns", "user_id")
        .agg(
            F.max("ts_us").alias("last_ts_ns"),
            (F.round(F.max_by("value", "ts_us"), 6) + F.lit(0.0)).alias("last_value"),
        )
        .orderBy("snap_ns", "user_id")
    )


# --------------------------------------------------------------------------
# J15 — interval-overlap join (new round 4): pair up the 30-minute
# activity windows of DIFFERENT users that overlap in time (the
# concurrency / co-occurrence question: sessions sharing wall-clock).
# interval×interval has no equi-key; operators/rangejoin.py
# `interval_overlap_join` bins both sides and claims each pair at its
# canonical bucket (bucket of max(start,start)) — structural
# uniqueness, no post-join DISTINCT shuffle. Inputs here are per-user
# error windows (ts .. ts+30min), restricted to user_id < 40 on the
# left to keep the sf0.01 pair count in the thousands.
# --------------------------------------------------------------------------
_J15_LEN_NS = 30 * 60 * 1_000_000_000


@register(
    "j15_interval_overlap_join",
    oracle=f"""
    WITH w AS (
      SELECT user_id, event_id,
             epoch_ns(ts) AS s, epoch_ns(ts) + {_J15_LEN_NS} AS e
      FROM events WHERE event_type = 'error')
    SELECT a.event_id AS a_id, b.event_id AS b_id,
           a.user_id AS a_user, b.user_id AS b_user
    FROM w a JOIN w b
      ON a.user_id < b.user_id
     AND a.s <= b.e AND b.s <= a.e
    WHERE a.user_id < 40
    ORDER BY a_id, b_id
    """,
)
def j15_interval_overlap_join(spark, sf_dir):
    from kompactor_spark.operators.rangejoin import interval_overlap_join

    T = loader(sf_dir, spark)
    ts_us = F.col("ts") - F.col("ts") % 1000
    w = T("events").where(F.col("event_type") == "error")
    left = w.where(F.col("user_id") < 40).select(
        F.col("event_id").alias("a_id"),
        F.col("user_id").alias("a_user"),
        ts_us.alias("a_s"),
        (ts_us + _J15_LEN_NS).alias("a_e"),
    )
    right = w.select(
        F.col("event_id").alias("b_id"),
        F.col("user_id").alias("b_user"),
        ts_us.alias("b_s"),
        (ts_us + _J15_LEN_NS).alias("b_e"),
    )
    return (
        interval_overlap_join(left, right, "a_s", "a_e", "b_s", "b_e", bucket_ns=NS_PER_HOUR)
        .where(F.col("a_user") < F.col("b_user"))
        .select("a_id", "b_id", "a_user", "b_user")
        .orderBy("a_id", "b_id")
    )


# --------------------------------------------------------------------------
# X22 — threshold crossings (new round 4): alert-edge detection — emit a
# row whenever a user's value series crosses the threshold between
# consecutive samples, with direction ('rise' on <=θ → >θ, 'fall' on
# the reverse). The lag pair is one window shuffle on user_id; output
# is proportional to the crossing count, not the series length — the
# shape an alerting backend needs at 100 TB (scan once, emit edges).
# --------------------------------------------------------------------------
_X22_THETA = 0.9


@register(
    "x22_threshold_crossings",
    oracle=f"""
    WITH s AS (
      SELECT user_id, event_id, epoch_ns(ts) AS ts_ns, value,
             lag(value) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS prev
      FROM events)
    SELECT user_id, event_id, ts_ns,
           round(prev, 6) + 0.0 AS prev_value,
           round(value, 6) + 0.0 AS value,
           CASE WHEN value > {_X22_THETA!r} THEN 'rise' ELSE 'fall' END AS direction
    FROM s
    WHERE prev IS NOT NULL
      AND ((prev <= {_X22_THETA!r} AND value > {_X22_THETA!r})
        OR (prev > {_X22_THETA!r} AND value <= {_X22_THETA!r}))
    ORDER BY user_id, ts_ns, event_id
    """,
)
def x22_threshold_crossings(spark, sf_dir):
    from pyspark.sql import Window

    T = loader(sf_dir, spark)
    th = F.lit(_X22_THETA)
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    s = (
        T("events")
        .select(
            "user_id",
            "event_id",
            (F.col("ts") - F.col("ts") % 1000).alias("ts_ns"),
            "value",
        )
        .withColumn("prev", F.lag("value").over(w))
    )
    crossed = (
        (F.col("prev") <= th) & (F.col("value") > th)
    ) | ((F.col("prev") > th) & (F.col("value") <= th))
    return (
        s.where(F.col("prev").isNotNull() & crossed)
        .select(
            "user_id",
            "event_id",
            "ts_ns",
            (F.round("prev", 6) + F.lit(0.0)).alias("prev_value"),
            (F.round("value", 6) + F.lit(0.0)).alias("value"),
            F.when(F.col("value") > th, "rise").otherwise("fall").alias("direction"),
        )
        .orderBy("user_id", "ts_ns", "event_id")
    )


# --------------------------------------------------------------------------
# K3 — EXACT incremental rollup (new round 4): the continuous-aggregate
# pattern with exact money math. The hourly rollup materializes
# re-aggregatable state — count + the value sum as exact fixed-point
# LIMB sums (fixedpoint.py, e6 units) — and the daily answer is built
# by summing the hourly limbs, NEVER re-scanning raw events. The oracle
# computes the daily answer directly from raw rows, so a green hash
# PROVES re-aggregation exactness: rollup-of-rollups == raw recompute,
# bit-for-bit. (Floating-point partial sums cannot make this guarantee —
# summation order would differ between the two paths; integer limbs
# make the algebra associative for real.) At 100 TB: one pass over raw
# per hour, day/month/ad-hoc grains from KB-sized rollup rows.
# --------------------------------------------------------------------------
_NS_PER_DAY = 24 * NS_PER_HOUR


@register(
    "k3_incremental_rollup",
    oracle=f"""
    SELECT event_type,
           (epoch_ns(ts) // {_NS_PER_DAY}) * {_NS_PER_DAY} AS day_ns,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0
             AS value_sum
    FROM events
    GROUP BY 1, 2
    ORDER BY event_type, day_ns
    """,
)
def k3_incremental_rollup(spark, sf_dir):
    from kompactor_spark import fixedpoint as fx

    T = loader(sf_dir, spark)
    units = fx.to_units("value", 6)
    hi, lo = fx.limb_split(units)
    # pass 1 — the ONLY scan of raw events: hourly materialization
    hourly = (
        T("events")
        .select(
            "event_type",
            (F.col("ts") - F.col("ts") % NS_PER_HOUR).cast("long").alias("hour_ns"),
            hi.alias("v_hi"),
            lo.alias("v_lo"),
        )
        .groupBy("event_type", "hour_ns")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v_hi").alias("hi_s"),
            F.sum("v_lo").alias("lo_s"),
        )
    )
    # pass 2 — day grain from the rollup alone (re-aggregate the limbs)
    return (
        hourly.groupBy(
            "event_type",
            (F.col("hour_ns") - F.col("hour_ns") % _NS_PER_DAY).cast("long").alias("day_ns"),
        )
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            fx.exact_sum("hi_s", "lo_s", 6).cast("double").alias("value_sum"),
        )
        .orderBy("event_type", "day_ns")
    )


# --------------------------------------------------------------------------
# X24 — seasonal-naive forecast backtest (new round 4): forecast each
# (event_type, hour) count as the count one week earlier, then score
# the forecast's absolute error over the back half of the range — the
# baseline every real forecasting pipeline must beat, and the backtest
# join is the shape that matters at scale (self-join on the shifted
# key, never a per-series loop). Integer counts → exact MAE numerator;
# one narrow aggregate + one equi-join on (type, hour-1week).
# --------------------------------------------------------------------------
@register(
    "x24_seasonal_backtest",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type,
             (epoch_ns(ts) // {NS_PER_HOUR}) * {NS_PER_HOUR} AS hour_ns,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    scored AS (
      SELECT cur.event_type, cur.hour_ns, cur.n,
             prev.n AS forecast,
             abs(cur.n - prev.n) AS abs_err
      FROM hourly cur JOIN hourly prev
        ON prev.event_type = cur.event_type
       AND prev.hour_ns = cur.hour_ns - {7 * 24 * NS_PER_HOUR})
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_hours,
           CAST(sum(abs_err) AS BIGINT) AS total_abs_err,
           round(CAST(sum(abs_err) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mae
    FROM scored
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def x24_seasonal_backtest(spark, sf_dir):
    T = loader(sf_dir, spark)
    week_ns = 7 * 24 * NS_PER_HOUR
    hourly = (
        T("events")
        .groupBy(
            "event_type",
            (F.col("ts") - F.col("ts") % NS_PER_HOUR).cast("long").alias("hour_ns"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    cur = hourly.select("event_type", "hour_ns", "n")
    prev = hourly.select(
        F.col("event_type").alias("p_type"),
        (F.col("hour_ns") + week_ns).alias("p_hour"),
        F.col("n").alias("forecast"),
    )
    scored = cur.join(
        prev, (F.col("event_type") == F.col("p_type")) & (F.col("hour_ns") == F.col("p_hour"))
    ).select("event_type", (F.abs(F.col("n") - F.col("forecast"))).alias("abs_err"))
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hours"),
            F.sum("abs_err").cast("bigint").alias("total_abs_err"),
            F.round(
                F.sum("abs_err").cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("mae"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# X25 — time-weighted average (new round 4): the irregular-sampling
# statistic every metrics store ships (InfluxDB integral()/
# TimescaleDB time_weight): each sample's value holds until the next
# sample (LOCF step function), so the mean weights each value by its
# holding duration, not its sample count — a sensor that reports once
# an hour at 100 and once a second at 0 must NOT average near 50.
# Exactness across engines: the per-row integral term value_e6 ×
# duration_us is an exact int64 (< 2^50 here), limb-split and summed
# on the long fast path (fixedpoint.py), so the numerator is EXACT on
# both engines — no float summation-order drift — and the single final
# division is the only floating-point operation. One window shuffle
# (lead) + one aggregate on the same key.
# --------------------------------------------------------------------------
@register(
    "x25_time_weighted_avg",
    oracle="""
    WITH s AS (
      SELECT user_id, epoch_ns(ts) AS ts_ns, event_id, value,
             lead(epoch_ns(ts)) OVER (PARTITION BY user_id
                                      ORDER BY epoch_ns(ts), event_id) AS next_ns
      FROM events),
    seg AS (
      SELECT user_id,
             CAST(round(value * 100) AS HUGEINT)
               * CAST((next_ns - ts_ns) // 1000 AS HUGEINT) AS term_e2us,
             (next_ns - ts_ns) // 1000 AS dur_us
      FROM s WHERE next_ns IS NOT NULL)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(sum(dur_us) AS BIGINT) AS total_dur_us,
           round(CAST(sum(term_e2us) AS DOUBLE)
                 / (100.0 * CAST(sum(dur_us) AS DOUBLE)), 6) + 0.0 AS tw_avg
    FROM seg
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def x25_time_weighted_avg(spark, sf_dir):
    from pyspark.sql import Window

    from kompactor_spark import fixedpoint as fx

    T = loader(sf_dir, spark)
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    s = (
        T("events")
        .select(
            "user_id",
            (F.col("ts") - F.col("ts") % 1000).alias("ts_ns"),
            "event_id",
            "value",
        )
        .withColumn("next_ns", F.lead("ts_ns").over(w))
        .where(F.col("next_ns").isNotNull())
    )
    dur_us = ((F.col("next_ns") - F.col("ts_ns")) / 1000).cast("long")
    # e2 units (values are exact 2-decimal) x µs durations: worst-case
    # term ~ 5e4 x 4e11 = 2e16, comfortably inside int64 — e6 units
    # overflowed on multi-day gaps (the ARITHMETIC_OVERFLOW ANSI error,
    # caught by the oracle harness). Bound: value_e2 x span_us < 2^63
    # holds to ~6-year gaps at value 1e5.
    term = fx.to_units("value", 2) * dur_us  # exact int64 integral term
    hi, lo = fx.limb_split(term)
    seg = s.select("user_id", dur_us.alias("dur_us"), hi.alias("t_hi"), lo.alias("t_lo"))
    return (
        seg.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_segments"),
            F.sum("dur_us").cast("bigint").alias("total_dur_us"),
            (
                F.round(
                    fx.exact_sum("t_hi", "t_lo", 0).cast("double")
                    / (F.lit(100.0) * F.sum("dur_us").cast("double")),
                    6,
                )
                + F.lit(0.0)
            ).alias("tw_avg"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# X26 — exact per-series OLS trend slope: least-squares value-vs-time
# slope per event_type, computed ENTIRELY from integer moments.
# x = epoch seconds recentred to the series' min (keeps every moment
# within long/HUGEINT range), y = value in exact cents (the testdata's
# fixed-point unit). n, Σx, Σy, Σxy, Σx² are integer sums — order-free —
# and the closed form (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) is evaluated in
# DECIMAL(38)/HUGEINT space, so both engines produce the identical
# double at the single final division. The standard drift detector for
# counter/gauge series; at 100 TB it is one partial+final agg per
# series (limb sums in codegen), no window, no sort. The moment sums
# are per-moment limb-split (x² at 29 bits, x·y at 24, x at 14 —
# fixedpoint.limb_split): plain long SUMs overflowed ANSI at the sf1
# span (perf_smoke catch), while the splits are safe to ~1.8e10
# rows/series at a 10-year second-scale span (three limbs beyond).
# --------------------------------------------------------------------------
@register(
    "x26_trend_slope",
    oracle="""
    WITH e AS (
      SELECT event_type,
             epoch_ns(ts) // 1000000000 AS xs,
             CAST(round(value * 100) AS BIGINT) AS yc
      FROM events),
    r AS (
      SELECT event_type, xs - MIN(xs) OVER (PARTITION BY event_type) AS x, yc AS y
      FROM e),
    m AS (
      SELECT event_type,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(x * y) AS HUGEINT) AS sxy,
             CAST(SUM(x * x) AS HUGEINT) AS sx2
      FROM r GROUP BY event_type)
    SELECT event_type,
           CAST(n AS BIGINT) AS n_samples,
           round((CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sx2 - sx * sx AS DOUBLE)) / 100.0, 6) + 0.0 AS slope_per_s
    FROM m
    WHERE n * sx2 - sx * sx <> 0
    ORDER BY event_type
    """,
)
def x26_trend_slope(spark, sf_dir):
    from kompactor_spark import fixedpoint as fx

    T = loader(sf_dir, spark)
    e = T("events").select(
        "event_type",
        F.expr("ts div 1000000000").cast("long").alias("xs"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    # Recentre on the per-series min via a 5-row aggregate broadcast
    # back — NOT min() OVER (PARTITION BY event_type): the bare-key
    # window is the §7c low-cardinality pathology (it shuffles the FULL
    # event set into #series tasks and buffers each series in one
    # WindowExec). The extra scan of (event_type, ts) is column-pruned
    # and fully parallel; the join side is #series rows. Round 13 —
    # same class as x23's sweep fix (A/B in SCALE.md round-13 section).
    # eqNullSafe, not USING (ADVICE r13): the window this replaced kept
    # a NULL event_type as its own partition group; a plain equi-join
    # would silently drop that group. <=> is still a supported
    # BroadcastHashJoin key, so the plan shape is unchanged.
    mins = e.groupBy("event_type").agg(F.min("xs").alias("_xs0"))
    r = e.join(
        F.broadcast(mins.withColumnRenamed("event_type", "_et")),
        F.col("event_type").eqNullSafe(F.col("_et")),
    ).select("event_type", (F.col("xs") - F.col("_xs0")).alias("x"), "y")
    # Long SUMs of the raw products overflow under ANSI once the series
    # span grows (caught by perf_smoke at sf1: x ≤ ~2.6e7 s, x² ≤
    # ~6.7e14, SUM over 2e5 rows/series > 2^63 → ArithmeticException;
    # DuckDB's BIGINT sums promote to HUGEINT so the oracle never
    # throws). Per-moment limb splits keep every sum on the long
    # codegen path: split near half the product's bit width — x² ≤ 2^57
    # for a 10-year second-scale span → 29 bits (~1.8e10 rows/series on
    # both limbs), x·y ≤ 2^48 → 24, x ≤ 2^28 → 14. Recombined exactly
    # in DECIMAL(38,0) with no division (exact_sum_units).
    xy_hi, xy_lo = fx.limb_split(F.col("x") * F.col("y"), 24)
    x2_hi, x2_lo = fx.limb_split(F.col("x") * F.col("x"), 29)
    x_hi, x_lo = fx.limb_split(F.col("x"), 14)
    r = r.select(
        "event_type",
        "y",
        xy_hi.alias("__xy_hi"),
        xy_lo.alias("__xy_lo"),
        x2_hi.alias("__x2_hi"),
        x2_lo.alias("__x2_lo"),
        x_hi.alias("__x_hi"),
        x_lo.alias("__x_lo"),
    )
    m = r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        fx.exact_sum_units("__x_hi", "__x_lo", 14).alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        fx.exact_sum_units("__xy_hi", "__xy_lo", 24).alias("sxy"),
        fx.exact_sum_units("__x2_hi", "__x2_lo", 29).alias("sx2"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")
    return (
        m.where(den != 0)
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n_samples"),
            (
                F.round((num.cast("double") / den.cast("double")) / F.lit(100.0), 6)
                + F.lit(0.0)
            ).alias("slope_per_s"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# X23 — peak concurrency via the sweep line (new round 4): each event
# opens a 5-minute activity interval [ts, ts+5m); the question "what was
# the maximum number of simultaneously open intervals, and when was it
# first reached" is the capacity-planning primitive (max concurrent
# sessions / connections / jobs). Shape (round 13): pointize each
# interval into a +1/-1 delta row (a union, no shuffle), then the
# BUCKETED two-level prefix sum in operators/sweepline.py — the time
# axis is cut into contiguous ranges so the running sum parallelizes
# over (series × bucket) groups instead of serializing one sort task
# per series key (the §7c low-cardinality-window pathology; sf10
# 12.4 s → 5.2 s, scripts/x23_shape_ab_sf10_out.json). Exclusive
# bucket offsets and the peak reduction see only series×bucket rows.
# Output is O(series), input-linear work, one heavy exchange.
#
# Tie discipline: ordering is (t, d) with closes (-1) sorting before
# opens (+1), so touching intervals [a,b) [b,c) never double-count —
# half-open semantics, identical in both engines because the default
# RANGE frame includes all peers of the full ordering key.
# --------------------------------------------------------------------------
_X23_HOLD_NS = 300_000_000_000  # 5-minute activity window


@register(
    "x23_max_concurrency",
    oracle=f"""
    WITH pts AS (
      SELECT event_type, epoch_ns(ts) AS t, 1 AS d FROM events
      UNION ALL
      SELECT event_type, epoch_ns(ts) + {_X23_HOLD_NS}, -1 FROM events),
    run AS (
      SELECT event_type, t, d,
             SUM(d) OVER (PARTITION BY event_type ORDER BY t, d) AS c
      FROM pts),
    mx AS (
      SELECT event_type, MAX(c) AS peak FROM run GROUP BY event_type)
    SELECT r.event_type,
           CAST(m.peak AS BIGINT) AS peak_concurrency,
           CAST(MIN(r.t) AS BIGINT) AS first_peak_ns
    FROM run r JOIN mx m ON r.event_type = m.event_type AND r.c = m.peak
    GROUP BY r.event_type, m.peak
    ORDER BY r.event_type
    """,
)
def x23_max_concurrency(spark, sf_dir):
    from kompactor_spark.operators.sweepline import peak_concurrency

    T = loader(sf_dir, spark)
    # µs floor (x18 policy): ordering-sensitive ts must match DuckDB's
    # µs-truncated view if the data ships ns-encoded
    ts_us = F.col("ts") - F.col("ts") % 1000
    iv = T("events").select(
        "event_type", ts_us.alias("t"), (ts_us + F.lit(_X23_HOLD_NS)).alias("e")
    )
    return (
        # explicit bucketed lane: event_type is ~5 values (known), so
        # skip the "auto" dispatch's cardinality-probe job (round 14)
        peak_concurrency(iv, "event_type", "t", "e", n_buckets=64)
        .withColumnRenamed("first_peak", "first_peak_ns")
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# X28 — hour-of-day latency bands (new round 4): per (event_type,
# hour-of-day 0-23), the p50/p95/p99 of `value` plus sample count — the
# standard observability dashboard percentile-band panel, exposing
# diurnal load patterns. Exact interpolated percentiles (Spark
# percentile == DuckDB quantile_cont, parity driver-proven by a9);
# single shuffle on the ~120-key group — at 100 TB the group count is
# still tiny, so AQE coalesces the agg exchange to a handful of tasks
# while the scan parallelism stays wide.
# --------------------------------------------------------------------------
@register(
    "x28_latency_bands",
    oracle=f"""
    SELECT event_type,
           CAST((epoch_ns(ts) // {NS_PER_HOUR}) % 24 AS BIGINT) AS hour_of_day,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.95), 6) AS p95,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events
    GROUP BY event_type, hour_of_day
    ORDER BY event_type, hour_of_day
    """,
)
def x28_latency_bands(spark, sf_dir):
    from kompactor_spark.operators.quantiles import grouped_exact_quantiles

    T = loader(sf_dir, spark)
    # Exact long division (`div`): `ts / lit` would convert the ~1.7e18
    # ns long to double (> 2^53 → rounds to ~256 ns granularity) and
    # could flip events within ~128 ns of an hour boundary vs the
    # oracle's integer `//`.
    hod = (F.expr(f"ts div {NS_PER_HOUR}") % 24).alias("hour_of_day")
    # Round 5: grouped percentile moved off the grouped `percentile`
    # aggregate (per-group distinct-value reducer buffer — each of the
    # ~120 cells holds 1/120th of ALL rows at 100 TB) onto the targeted
    # order-statistics pass (operators/quantiles.py). Raw cuts come
    # back bit-identical to `percentile`; rounding stays JVM-side so
    # the proven round/quantile_cont parity is untouched.
    bands = grouped_exact_quantiles(
        T("events").select("event_type", hod, "value"),
        ["event_type", "hour_of_day"],
        "value",
        {"p50_raw": 0.5, "p95_raw": 0.95, "p99_raw": 0.99},
    )
    return bands.select(
        "event_type",
        F.col("hour_of_day").cast("bigint").alias("hour_of_day"),
        F.col("n").cast("bigint").alias("n"),
        F.round("p50_raw", 6).alias("p50"),
        F.round("p95_raw", 6).alias("p95"),
        F.round("p99_raw", 6).alias("p99"),
    ).orderBy("event_type", "hour_of_day")


# --------------------------------------------------------------------------
# X27 — merged-interval coverage (new round 4): per user, the total
# wall-clock time covered by the union of their 5-minute activity
# intervals, and how many disjoint activity islands that union has —
# the gaps-and-islands primitive behind billable-time, uptime-%, and
# session-stitching queries. Shape (round 13): the telescoping sweep
# in operators/sweepline.py — per row, only the PREFIX MAX of end is
# needed (island ids are never materialized: break rows contribute
# e - t, extenders max(0, e - prev_end), telescoping to exactly
# sum(max_e - min_t) per island), so the old island-id window and the
# (key, island) intermediate agg are gone: one window, one bare-key
# agg on the same exchange. Keys here are user_id (high cardinality),
# so the per-key window lane is the measured-fastest arm at sf10; the
# operator's opt-in bucketed lane covers low-cardinality callers
# (x23's §7c pathology). Coverage arithmetic is all int64 ns: exact,
# no float drift. Ties broken by unique event_id so both engines see
# the same ROWS-frame order.
# --------------------------------------------------------------------------
@register(
    "x27_interval_coverage",
    oracle=f"""
    WITH iv AS (
      SELECT user_id, event_id, epoch_ns(ts) AS t,
             epoch_ns(ts) + {_X23_HOLD_NS} AS e
      FROM events),
    m AS (
      SELECT user_id, event_id, t, e,
             CASE WHEN MAX(e) OVER w IS NULL OR t > MAX(e) OVER w
                  THEN 1 ELSE 0 END AS brk
      FROM iv
      WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
    isl AS (
      SELECT user_id, t, e,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM m),
    g AS (
      SELECT user_id, island, MIN(t) AS s, MAX(e) AS en
      FROM isl GROUP BY user_id, island)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(en - s) AS BIGINT) AS covered_ns
    FROM g GROUP BY user_id
    ORDER BY user_id
    """,
)
def x27_interval_coverage(spark, sf_dir):
    from kompactor_spark.operators.sweepline import interval_coverage

    T = loader(sf_dir, spark)
    ts_us = F.col("ts") - F.col("ts") % 1000  # µs floor (x18 policy)
    iv = T("events").select(
        "user_id",
        "event_id",
        ts_us.alias("t"),
        (ts_us + F.lit(_X23_HOLD_NS)).alias("e"),
    )
    return (
        interval_coverage(iv, "user_id", "t", "e", "event_id")
        .withColumnRenamed("covered", "covered_ns")
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# X29 — last-touch attribution (new round 4): every `purchase` is
# attributed to the user's most recent preceding touch event (click /
# view) within a 24 h lookback, else to '(none)' — the marketing /
# growth attribution primitive. Shape: the as-of mechanism of
# operators/asof.py (union the two streams, one keyed window pass with
# last(..., ignorenulls)) — never a per-conversion range join. Ordering
# is (ts, kind, event_id): touches sort before a conversion at the same
# instant, unique event_id makes the ROWS frame order identical in both
# engines. Output is a per-channel conversion census.
# --------------------------------------------------------------------------
_X29_LOOKBACK_NS = 24 * NS_PER_HOUR


@register(
    "x29_last_touch_attribution",
    oracle=f"""
    WITH u AS (
      SELECT user_id, epoch_ns(ts) AS t, event_id,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_conv,
             CASE WHEN event_type IN ('click', 'view') THEN event_type END AS touch,
             CASE WHEN event_type IN ('click', 'view') THEN epoch_ns(ts) END AS touch_t
      FROM events
      WHERE event_type IN ('purchase', 'click', 'view')),
    w AS (
      SELECT user_id, t, is_conv,
             last_value(touch IGNORE NULLS) OVER win AS last_touch,
             last_value(touch_t IGNORE NULLS) OVER win AS last_touch_t
      FROM u
      WINDOW win AS (PARTITION BY user_id ORDER BY t, is_conv, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT COALESCE(CASE WHEN t - last_touch_t <= {_X29_LOOKBACK_NS} THEN last_touch END,
                    '(none)') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_conversions
    FROM w
    WHERE is_conv = 1
    GROUP BY channel
    ORDER BY channel
    """,
)
def x29_last_touch_attribution(spark, sf_dir):
    T = loader(sf_dir, spark)
    is_touch = F.col("event_type").isin("click", "view")
    u = (
        T("events")
        .where(F.col("event_type").isin("purchase", "click", "view"))
        .select(
            "user_id",
            (F.col("ts") - F.col("ts") % 1000).alias("t"),  # µs floor
            "event_id",
            (F.col("event_type") == "purchase").cast("int").alias("is_conv"),
            F.when(is_touch, F.col("event_type")).alias("touch"),
            F.when(is_touch, F.col("ts") - F.col("ts") % 1000).alias("touch_t"),
        )
    )
    win = (
        Window.partitionBy("user_id")
        .orderBy("t", "is_conv", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w = u.select(
        "t",
        "is_conv",
        F.last("touch", ignorenulls=True).over(win).alias("last_touch"),
        F.last("touch_t", ignorenulls=True).over(win).alias("last_touch_t"),
    )
    attributed = F.coalesce(
        F.when(F.col("t") - F.col("last_touch_t") <= F.lit(_X29_LOOKBACK_NS), F.col("last_touch")),
        F.lit("(none)"),
    )
    return (
        w.where(F.col("is_conv") == 1)
        .select(attributed.alias("channel"))
        .groupBy("channel")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_conversions"))
        .orderBy("channel")
    )


# --------------------------------------------------------------------------
# X30 — sliding-window rate spikes (new round 4): per user, the number
# of events inside the trailing 10-minute window at every event, the
# worst (max) such burst, and how many events sat in an over-threshold
# burst — the rate-limiter / abuse-detection primitive. A RANGE frame
# over the int64-ns time axis (not ROWS: simultaneous events must all
# count), one keyed window pass, exact BIGINT arithmetic throughout;
# the per-user rollup reuses the window's hash partitioning.
# --------------------------------------------------------------------------
_X30_WIN_NS = 600_000_000_000  # trailing 10 minutes
_X30_THRESH = 5


@register(
    "x30_rate_spike",
    oracle=f"""
    WITH r AS (
      SELECT user_id,
             COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts)
                            RANGE BETWEEN {_X30_WIN_NS} PRECEDING AND CURRENT ROW)
               AS in_window
      FROM events)
    SELECT user_id,
           CAST(MAX(in_window) AS BIGINT) AS peak_rate,
           CAST(COUNT(*) FILTER (WHERE in_window >= {_X30_THRESH}) AS BIGINT)
             AS n_burst_events
    FROM r GROUP BY user_id
    ORDER BY user_id
    """,
)
def x30_rate_spike(spark, sf_dir):
    T = loader(sf_dir, spark)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-_X30_WIN_NS, 0)
    )
    r = T("events").select(
        "user_id",
        (F.col("ts") - F.col("ts") % 1000).alias("ts_us"),  # µs floor
    ).select("user_id", F.count(F.lit(1)).over(w).alias("in_window"))
    return (
        r.groupBy("user_id")
        .agg(
            F.max("in_window").cast("bigint").alias("peak_rate"),
            F.count(F.when(F.col("in_window") >= _X30_THRESH, 1))
            .cast("bigint")
            .alias("n_burst_events"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# X31 — cohort LTV curve (new round 4): users are cohorted by first-seen
# epoch-week; per (cohort_week, weeks_since_cohort) the purchase revenue
# and the cohort's CUMULATIVE revenue — the lifetime-value triangle that
# extends the x10 retention triangle with money. Revenue partials are
# exact DECIMALs; the cumulative sum runs on the already-aggregated
# O(weeks²) grid (tiny at any input scale), staying in DECIMAL until
# the final DOUBLE presentation. First-seen derivation is one keyed
# min-aggregate joined back on the SAME user key — no broadcast hint:
# the user dim can itself be billions of rows at 100 TB, so the join
# strategy is left to AQE (auto-broadcast when it fits, else both
# sides already hash on user_id and the exchange is shared).
# --------------------------------------------------------------------------
_NS_PER_WEEK = 7 * 24 * NS_PER_HOUR


@register(
    "x31_cohort_ltv",
    oracle=f"""
    WITH first_seen AS (
      SELECT user_id, MIN(epoch_ns(ts)) // {_NS_PER_WEEK} AS cohort_week
      FROM events GROUP BY user_id),
    rev AS (
      SELECT f.cohort_week,
             epoch_ns(e.ts) // {_NS_PER_WEEK} - f.cohort_week AS weeks_since,
             CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS revenue
      FROM events e JOIN first_seen f ON e.user_id = f.user_id
      WHERE e.event_type = 'purchase'
      GROUP BY 1, 2)
    SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
           CAST(weeks_since AS BIGINT) AS weeks_since,
           CAST(revenue AS DOUBLE) AS revenue,
           CAST(SUM(revenue) OVER (PARTITION BY cohort_week ORDER BY weeks_since
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS cum_revenue
    FROM rev
    ORDER BY cohort_week, weeks_since
    """,
)
def x31_cohort_ltv(spark, sf_dir):
    T = loader(sf_dir, spark)
    ev = T("events")
    first_seen = ev.groupBy("user_id").agg(
        # exact long division — see x28's hod note (ts > 2^53 as double)
        F.expr(f"min(ts) div {_NS_PER_WEEK}").alias("cohort_week")
    )
    rev = (
        ev.where(F.col("event_type") == "purchase")
        .join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            (F.expr(f"ts div {_NS_PER_WEEK}") - F.col("cohort_week")).alias("weeks_since"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).cast("decimal(28,6)").alias("revenue"))
    )
    cum = (
        Window.partitionBy("cohort_week")
        .orderBy("weeks_since")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return rev.select(
        F.col("cohort_week").cast("bigint").alias("cohort_week"),
        F.col("weeks_since").cast("bigint").alias("weeks_since"),
        F.col("revenue").cast("double").alias("revenue"),
        F.sum("revenue").over(cum).cast("double").alias("cum_revenue"),
    ).orderBy("cohort_week", "weeks_since")


# --------------------------------------------------------------------------
# X32 — alert episodes (new round 4): the x18 rolling-z anomalies are
# raw point alerts; operators need EPISODES — consecutive anomalies
# (within a 1 h re-arm gap, per user) merged into one incident with
# start/end, size, and worst severity. Composes the x18 frame with the
# x27 gaps-and-islands pass: both windows share the user key, so the
# whole pipeline is one shuffle. Severity max runs over z-scores that
# are already rounded per x18's boundary discipline — deterministic
# cross-engine. This is the alert-dedup/incident-rollup primitive of
# every monitoring stack.
# --------------------------------------------------------------------------
_X32_REARM_NS = NS_PER_HOUR


@register(
    "x32_alert_episodes",
    oracle=f"""
    WITH s AS (
      SELECT user_id, event_id, epoch_ns(ts) AS ts_ns, value FROM events),
    w AS (
      SELECT user_id, event_id, ts_ns, value,
             avg(value) OVER win AS mu,
             stddev_samp(value) OVER win AS sd,
             count(*) OVER win AS n_win
      FROM s
      WINDOW win AS (PARTITION BY user_id ORDER BY ts_ns
                     RANGE BETWEEN {_Z_WIN_NS} PRECEDING AND CURRENT ROW)),
    a AS (
      SELECT user_id, event_id, ts_ns,
             abs(round((value - mu) / sd, 6) + 0.0) AS sev
      FROM w
      WHERE n_win >= 5 AND sd > 0
        AND abs(round((value - mu) / sd, 6) + 0.0) >= 3.0),
    m AS (
      SELECT user_id, event_id, ts_ns, sev,
             CASE WHEN lag(ts_ns) OVER wo IS NULL
                       OR ts_ns - lag(ts_ns) OVER wo > {_X32_REARM_NS}
                  THEN 1 ELSE 0 END AS brk
      FROM a
      WINDOW wo AS (PARTITION BY user_id ORDER BY ts_ns, event_id)),
    isl AS (
      SELECT user_id, ts_ns, sev,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS episode
      FROM m)
    SELECT user_id, CAST(episode AS BIGINT) AS episode,
           CAST(MIN(ts_ns) AS BIGINT) AS start_ns,
           CAST(MAX(ts_ns) AS BIGINT) AS end_ns,
           CAST(COUNT(*) AS BIGINT) AS n_alerts,
           MAX(sev) AS peak_severity
    FROM isl GROUP BY user_id, episode
    ORDER BY user_id, episode
    """,
)
def x32_alert_episodes(spark, sf_dir):
    T = loader(sf_dir, spark)
    s = T("events").select(
        "user_id",
        "event_id",
        (F.col("ts") - F.col("ts") % 1000).alias("ts_ns"),  # µs floor (x18 policy)
        "value",
    )
    win = (
        Window.partitionBy("user_id").orderBy("ts_ns").rangeBetween(-_Z_WIN_NS, 0)
    )
    w = s.select(
        "user_id",
        "event_id",
        "ts_ns",
        "value",
        F.avg("value").over(win).alias("mu"),
        F.stddev_samp("value").over(win).alias("sd"),
        F.count("*").over(win).alias("n_win"),
    )
    sev = F.abs(F.round((F.col("value") - F.col("mu")) / F.col("sd"), 6) + F.lit(0.0))
    a = w.where((F.col("n_win") >= 5) & (F.col("sd") > 0) & (sev >= 3.0)).select(
        "user_id", "event_id", "ts_ns", sev.alias("sev")
    )
    wo = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    prev_ts = F.lag("ts_ns").over(wo)
    brk = F.when(prev_ts.isNull() | (F.col("ts_ns") - prev_ts > _X32_REARM_NS), 1).otherwise(0)
    isl = a.withColumn(
        "episode", F.sum(brk).over(wo.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        isl.groupBy("user_id", F.col("episode").cast("bigint").alias("episode"))
        .agg(
            F.min("ts_ns").cast("bigint").alias("start_ns"),
            F.max("ts_ns").cast("bigint").alias("end_ns"),
            F.count(F.lit(1)).cast("bigint").alias("n_alerts"),
            F.max("sev").alias("peak_severity"),
        )
        .orderBy("user_id", "episode")
    )


# --------------------------------------------------------------------------
# X33 — DAU/WAU stickiness (new round 4): per day, the exact count of
# distinct active users that day (DAU), in the trailing 7 days (WAU),
# and the DAU/WAU stickiness ratio — the engagement triple on every
# product dashboard. Exact sliding-window distinct does NOT decompose
# into mergeable per-day partials, so the scalable exact shape is:
# dedup to (user, day) once (the only pass over raw events), then join
# the 7-day trailing spine against that dedup — work is
# O(active-pairs × 7), never a rescan of raw events; the sketch
# alternative for approximate rollups is A17's mergeable HLL.
# --------------------------------------------------------------------------
_DAY_NS = 24 * NS_PER_HOUR


@register(
    "x33_active_user_stickiness",
    oracle=f"""
    WITH ud AS (
      SELECT DISTINCT user_id, epoch_ns(ts) // {_DAY_NS} AS day
      FROM events),
    dau AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day),
    wau AS (
      SELECT d.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
      FROM (SELECT DISTINCT day FROM ud) d
      JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
      GROUP BY d.day)
    SELECT CAST(dau.day AS BIGINT) AS day, dau.dau, wau.wau,
           round(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
    FROM dau JOIN wau ON dau.day = wau.day
    ORDER BY day
    """,
)
def x33_active_user_stickiness(spark, sf_dir):
    T = loader(sf_dir, spark)
    ud = (
        T("events")
        # exact long division — see x28's hod note (ts > 2^53 as double)
        .select("user_id", F.expr(f"ts div {_DAY_NS}").alias("day"))
        .distinct()
        .localCheckpoint(eager=False)  # feeds DAU, the spine, and the WAU join
    )
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).cast("bigint").alias("dau"))
    spine = ud.select("day").distinct().select(F.col("day").alias("d"))
    wau = (
        spine.join(ud, (F.col("day") >= F.col("d") - 6) & (F.col("day") <= F.col("d")))
        .groupBy("d")
        .agg(F.countDistinct("user_id").cast("bigint").alias("wau"))
    )
    return (
        dau.join(wau, dau.day == wau.d)
        .select(
            F.col("day").cast("bigint").alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias("stickiness"),
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# X34 — rolling OLS trend slope (new round 4): per event, the
# least-squares slope (per second) of the trailing K=8 samples — the
# local-trend smoother behind "is this metric ramping" alerts,
# complementing x26's global per-series slope and x19's EWMA level.
# Determinism: the K-sample window is materialized as explicit lag
# columns and every Σx, Σy, Σxy, Σx² is written as a FIXED-ORDER
# left-associated sum expression (both engines parse a+b+c the same
# way), so the float arithmetic is bit-identical — the x19 finite-
# window discipline applied to regression. Emitted only once the
# window is full; x origin at the oldest sample keeps magnitudes tiny.
# --------------------------------------------------------------------------
_X34_K = 8


def _x34_sums(terms: list[str]) -> str:
    return "(" + " + ".join(terms) + ")"


@register(
    "x34_rolling_slope",
    oracle=(
        lambda K=_X34_K: f"""
    WITH s AS (
      SELECT user_id, event_id, epoch_ns(ts) AS ts_ns, value FROM events),
    l AS (
      SELECT user_id, event_id, ts_ns,
             {", ".join(
                 f"lag(value, {i}) OVER w AS y{i}, lag(ts_ns, {i}) OVER w AS t{i}"
                 for i in range(K))}
      FROM s
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id)),
    x AS (
      SELECT user_id, event_id, ts_ns,
             {", ".join(
                 f"CAST(t{i} - t{K - 1} AS DOUBLE) / 1e9 AS x{i}, y{i}"
                 for i in range(K))}
      FROM l WHERE t{K - 1} IS NOT NULL)
    SELECT user_id, event_id, ts_ns,
           round(({K} * {_x34_sums([f"x{i} * y{i}" for i in range(K)])}
                  - {_x34_sums([f"x{i}" for i in range(K)])}
                    * {_x34_sums([f"y{i}" for i in range(K)])})
                 / NULLIF({K} * {_x34_sums([f"x{i} * x{i}" for i in range(K)])}
                          - {_x34_sums([f"x{i}" for i in range(K)])}
                            * {_x34_sums([f"x{i}" for i in range(K)])}, 0),
                 6) + 0.0 AS slope_per_s
    FROM x
    ORDER BY user_id, ts_ns, event_id
    """
    )(),
)
def x34_rolling_slope(spark, sf_dir):
    K = _X34_K
    T = loader(sf_dir, spark)
    s = T("events").select(
        "user_id",
        "event_id",
        (F.col("ts") - F.col("ts") % 1000).alias("ts_ns"),  # µs floor
        "value",
    )
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    l = s.select(
        "user_id",
        "event_id",
        "ts_ns",
        *[F.lag("value", i).over(w).alias(f"y{i}") for i in range(K)],
        *[F.lag("ts_ns", i).over(w).alias(f"t{i}") for i in range(K)],
    )
    x = l.where(F.col(f"t{K - 1}").isNotNull()).select(
        "user_id",
        "event_id",
        "ts_ns",
        *[
            ((F.col(f"t{i}") - F.col(f"t{K - 1}")).cast("double") / F.lit(1e9)).alias(f"x{i}")
            for i in range(K)
        ],
        *[F.col(f"y{i}") for i in range(K)],
    )

    def fixed_sum(cols):
        e = cols[0]
        for c in cols[1:]:
            e = e + c
        return e

    sx = fixed_sum([F.col(f"x{i}") for i in range(K)])
    sy = fixed_sum([F.col(f"y{i}") for i in range(K)])
    sxy = fixed_sum([F.col(f"x{i}") * F.col(f"y{i}") for i in range(K)])
    sxx = fixed_sum([F.col(f"x{i}") * F.col(f"x{i}") for i in range(K)])
    # Degenerate window (all 8 µs-floored timestamps equal) → denominator
    # 0: make it NULL EXPLICITLY in both engines (oracle uses NULLIF) —
    # Spark non-ANSI x/0 is NULL but DuckDB IEEE division yields inf/NaN,
    # so without the guard the engines diverge on that row.
    den = F.lit(K) * sxx - sx * sx
    slope = F.when(den != F.lit(0.0), (F.lit(K) * sxy - sx * sy) / den)
    return x.select(
        "user_id",
        "event_id",
        "ts_ns",
        (F.round(slope, 6) + F.lit(0.0)).alias("slope_per_s"),
    ).orderBy("user_id", "ts_ns", "event_id")


# --------------------------------------------------------------------------
# X35 — seasonality strength (new round 4): per event_type, the share
# of value variance explained by the hour-of-day profile (the
# correlation ratio η² = SS_between / SS_total over the 24 hour-of-day
# cells) — "is this series diurnal" as one number, the test that
# decides whether a seasonal-naive forecast (x24) is even applicable.
# Exactness: every sum of squares is derived from DECIMAL power sums
# (a16 mechanism) per (type, hour) cell and per type. The 24-cell
# SS_between sum quantizes each cell's s1²/n term to 2^-20 units and
# sums as BIGINT (the l6_source_diversity fixedpoint pattern) — a plain
# double SUM would be summation-order dependent (Spark partition order
# vs DuckDB group order). 2^20 (not the usual 2^40) because the term
# grows ~linearly with rows (~2.7e6 at sf0.1): int64 headroom holds to
# ~3.7e11 per cell ≈ 10 TB of events. One scan, one 120-cell shuffle,
# one 5-row rollup.
# --------------------------------------------------------------------------
_X35_SCALE = 1 << 20


@register(
    "x35_seasonality_strength",
    oracle=f"""
    WITH cell AS (
      SELECT event_type,
             (epoch_ns(ts) // {NS_PER_HOUR}) % 24 AS hod,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(value AS DECIMAL(18,6))) AS s1,
             SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS s2
      FROM events GROUP BY 1, 2),
    t AS (
      SELECT event_type,
             CAST(SUM(n) AS BIGINT) AS n,
             CAST(SUM(s1) AS DOUBLE) AS s1,
             CAST(SUM(s2) AS DOUBLE) AS s2,
             CAST(SUM(CAST(round(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n
                                 * {_X35_SCALE}) AS BIGINT)) AS DOUBLE)
               / {_X35_SCALE} AS ss_cells
      FROM cell GROUP BY event_type)
    SELECT event_type, n,
           round(s2 - s1 * s1 / n, 6) AS ss_total,
           round(ss_cells - s1 * s1 / n, 6) + 0.0 AS ss_between,
           round((ss_cells - s1 * s1 / n) / (s2 - s1 * s1 / n), 6) + 0.0 AS eta_sq
    FROM t
    ORDER BY event_type
    """,
)
def x35_seasonality_strength(spark, sf_dir):
    T = loader(sf_dir, spark)
    v = F.col("value").cast("decimal(18,6)")
    # exact long division — see x28's hod note (ts > 2^53 as double)
    hod = (F.expr(f"ts div {NS_PER_HOUR}") % 24).alias("hod")
    cell = (
        T("events")
        .select("event_type", hod, v.alias("v"))
        .groupBy("event_type", "hod")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("v").alias("s1"),
            F.sum(F.col("v") * F.col("v")).alias("s2"),
        )
    )
    term = F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("n")
    t = cell.groupBy("event_type").agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("s1").cast("double").alias("s1"),
        F.sum("s2").cast("double").alias("s2"),
        (
            F.sum(F.round(term * F.lit(_X35_SCALE)).cast("bigint")).cast("double")
            / F.lit(_X35_SCALE)
        ).alias("ss_cells"),
    )
    grand = F.col("s1") * F.col("s1") / F.col("n")
    return t.select(
        "event_type",
        "n",
        F.round(F.col("s2") - grand, 6).alias("ss_total"),
        (F.round(F.col("ss_cells") - grand, 6) + F.lit(0.0)).alias("ss_between"),
        (F.round((F.col("ss_cells") - grand) / (F.col("s2") - grand), 6) + F.lit(0.0)).alias(
            "eta_sq"
        ),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# X36 — hourly-count autocorrelation (new round 4): per event_type, the
# lag-1 and lag-24 autocorrelation of the hourly event-count series —
# ACF(1) measures short-term persistence, ACF(24) confirms the diurnal
# cycle x35 quantifies. The series is the hourly count spine
# (zero-filled so lags align on REAL calendar hours, reusing the x7
# driver-built spine discipline); all correlation power sums are exact
# BIGINTs over integer counts, so both ACFs are closed-form doubles —
# bit-deterministic cross-engine.
# --------------------------------------------------------------------------
def _x36_acf_sql(lag: int) -> str:
    return f"""
      SELECT event_type, {lag} AS lag_hours,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM (SELECT event_type, n AS x,
                   lag(n, {lag}) OVER (PARTITION BY event_type ORDER BY hour_ns) AS y
            FROM spine)
      WHERE y IS NOT NULL
      GROUP BY event_type"""


@register(
    "x36_count_autocorrelation",
    oracle=f"""
    WITH bounds AS (
      SELECT (epoch_ns(min(ts)) // {NS_PER_HOUR}) * {NS_PER_HOUR} AS hmin,
             (epoch_ns(max(ts)) // {NS_PER_HOUR}) * {NS_PER_HOUR} AS hmax
      FROM events),
    grid AS (
      SELECT t.event_type, gs.h AS hour_ns
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(generate_series(hmin, hmax, {NS_PER_HOUR})) AS h
                  FROM bounds) gs),
    actual AS (
      SELECT event_type, (epoch_ns(ts) // {NS_PER_HOUR}) * {NS_PER_HOUR} AS hour_ns,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    spine AS (
      SELECT g.event_type, g.hour_ns, COALESCE(a.n, 0) AS n
      FROM grid g LEFT JOIN actual a
        ON g.event_type = a.event_type AND g.hour_ns = a.hour_ns),
    s AS ({_x36_acf_sql(1)} UNION ALL {_x36_acf_sql(24)})
    SELECT event_type, CAST(lag_hours AS BIGINT) AS lag_hours, n_pairs,
           round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n_pairs)
                 / (sqrt(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n_pairs)
                    * sqrt(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n_pairs)),
                 6) + 0.0 AS acf
    FROM s
    ORDER BY event_type, lag_hours
    """,
)
def x36_count_autocorrelation(spark, sf_dir):
    T = loader(sf_dir, spark)
    ev = T("events")
    b = ev.agg(
        (F.min("ts") - F.min("ts") % NS_PER_HOUR).alias("hmin"),
        (F.max("ts") - F.max("ts") % NS_PER_HOUR).alias("hmax"),
    ).first()
    spine_hours = ev.select("event_type").distinct().select(
        "event_type",
        F.explode(
            F.sequence(F.lit(int(b["hmin"])), F.lit(int(b["hmax"])), F.lit(NS_PER_HOUR))
        ).alias("hour_ns"),
    )
    actual = ev.groupBy(
        "event_type", (F.col("ts") - F.col("ts") % NS_PER_HOUR).alias("hour_ns")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    spine = spine_hours.join(actual, ["event_type", "hour_ns"], "left").select(
        "event_type", "hour_ns", F.coalesce("n", F.lit(0)).cast("bigint").alias("n")
    )
    w = Window.partitionBy("event_type").orderBy("hour_ns")
    outs = []
    for lag in (1, 24):
        pairs = spine.select(
            "event_type",
            F.col("n").alias("x"),
            F.lag("n", lag).over(w).alias("y"),
        ).where(F.col("y").isNotNull())
        # Power sums limb-split at 31 bits (x26's perf_smoke class):
        # each PRODUCT must fit int64 in both engines (DuckDB multiplies
        # BIGINTs before its HUGEINT sum), so counts are ≤ ~2^31 by the
        # shared contract, and the 31-bit split keeps both limb SUMs
        # long-safe to ~4.3e9 spine rows/series (hour-grain input, §7c —
        # never reached). sx/sy are plain sums of ≤2^31 over bounded
        # hours: safe as longs.
        from kompactor_spark import fixedpoint as fx

        xx_hi, xx_lo = fx.limb_split(F.col("x") * F.col("x"), 31)
        yy_hi, yy_lo = fx.limb_split(F.col("y") * F.col("y"), 31)
        xy_hi, xy_lo = fx.limb_split(F.col("x") * F.col("y"), 31)
        p = pairs.select(
            "event_type", "x", "y",
            xx_hi.alias("__xx_hi"), xx_lo.alias("__xx_lo"),
            yy_hi.alias("__yy_hi"), yy_lo.alias("__yy_lo"),
            xy_hi.alias("__xy_hi"), xy_lo.alias("__xy_lo"),
        )
        outs.append(
            p.groupBy("event_type").agg(
                F.lit(lag).cast("bigint").alias("lag_hours"),
                F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
                F.sum("x").cast("bigint").alias("sx"),
                F.sum("y").cast("bigint").alias("sy"),
                fx.exact_sum_units("__xx_hi", "__xx_lo", 31).alias("sxx"),
                fx.exact_sum_units("__yy_hi", "__yy_lo", 31).alias("syy"),
                fx.exact_sum_units("__xy_hi", "__xy_lo", 31).alias("sxy"),
            )
        )
    s = outs[0].unionByName(outs[1])
    n = F.col("n_pairs")
    num = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy") / n
    den = F.sqrt(
        F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx") / n
    ) * F.sqrt(F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy") / n)
    return s.select(
        "event_type",
        "lag_hours",
        "n_pairs",
        (F.round(num / den, 6) + F.lit(0.0)).alias("acf"),
    ).orderBy("event_type", "lag_hours")


# --------------------------------------------------------------------------
# X37 — cross-series correlation matrix (new round 4): the lag-0
# Pearson correlation of hourly event counts between every pair of
# event types — which workloads move together (shared driver) and
# which anti-correlate (cannibalization). Rides the same zero-filled
# hour spine as x36; the pair expansion is a spine self-join on the
# hour key (K² pairs of a K-series census, trivially bounded); all
# power sums are exact BIGINTs.
# --------------------------------------------------------------------------
@register(
    "x37_cross_type_correlation",
    oracle=f"""
    WITH bounds AS (
      SELECT (epoch_ns(min(ts)) // {NS_PER_HOUR}) * {NS_PER_HOUR} AS hmin,
             (epoch_ns(max(ts)) // {NS_PER_HOUR}) * {NS_PER_HOUR} AS hmax
      FROM events),
    grid AS (
      SELECT t.event_type, gs.h AS hour_ns
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(generate_series(hmin, hmax, {NS_PER_HOUR})) AS h
                  FROM bounds) gs),
    actual AS (
      SELECT event_type, (epoch_ns(ts) // {NS_PER_HOUR}) * {NS_PER_HOUR} AS hour_ns,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    spine AS (
      SELECT g.event_type, g.hour_ns, COALESCE(a.n, 0) AS n
      FROM grid g LEFT JOIN actual a
        ON g.event_type = a.event_type AND g.hour_ns = a.hour_ns),
    s AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_hours,
             CAST(SUM(a.n) AS BIGINT) AS sx, CAST(SUM(b.n) AS BIGINT) AS sy,
             CAST(SUM(a.n * a.n) AS BIGINT) AS sxx,
             CAST(SUM(b.n * b.n) AS BIGINT) AS syy,
             CAST(SUM(a.n * b.n) AS BIGINT) AS sxy
      FROM spine a JOIN spine b ON a.hour_ns = b.hour_ns
      WHERE a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT type_a, type_b, n_hours,
           round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n_hours)
                 / (sqrt(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n_hours)
                    * sqrt(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n_hours)),
                 6) + 0.0 AS corr_counts
    FROM s
    ORDER BY type_a, type_b
    """,
)
def x37_cross_type_correlation(spark, sf_dir):
    T = loader(sf_dir, spark)
    ev = T("events")
    b = ev.agg(
        (F.min("ts") - F.min("ts") % NS_PER_HOUR).alias("hmin"),
        (F.max("ts") - F.max("ts") % NS_PER_HOUR).alias("hmax"),
    ).first()
    grid = ev.select("event_type").distinct().select(
        "event_type",
        F.explode(
            F.sequence(F.lit(int(b["hmin"])), F.lit(int(b["hmax"])), F.lit(NS_PER_HOUR))
        ).alias("hour_ns"),
    )
    actual = ev.groupBy(
        "event_type", (F.col("ts") - F.col("ts") % NS_PER_HOUR).alias("hour_ns")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    spine = grid.join(actual, ["event_type", "hour_ns"], "left").select(
        "event_type", "hour_ns", F.coalesce("n", F.lit(0)).cast("bigint").alias("n")
    ).localCheckpoint(eager=False)  # both legs of the pair self-join
    a = spine.select(F.col("event_type").alias("type_a"), "hour_ns", F.col("n").alias("x"))
    bb = spine.select(F.col("event_type").alias("type_b"), "hour_ns", F.col("n").alias("y"))
    # 31-bit limb splits on the power sums — same contract bound as x36
    # (products must fit int64 in both engines; limb SUMs long-safe to
    # ~4.3e9 spine rows/pair, hour-grain §7c).
    from kompactor_spark import fixedpoint as fx

    j = a.join(bb, "hour_ns").where(F.col("type_a") < F.col("type_b"))
    xx_hi, xx_lo = fx.limb_split(F.col("x") * F.col("x"), 31)
    yy_hi, yy_lo = fx.limb_split(F.col("y") * F.col("y"), 31)
    xy_hi, xy_lo = fx.limb_split(F.col("x") * F.col("y"), 31)
    j = j.select(
        "type_a", "type_b", "x", "y",
        xx_hi.alias("__xx_hi"), xx_lo.alias("__xx_lo"),
        yy_hi.alias("__yy_hi"), yy_lo.alias("__yy_lo"),
        xy_hi.alias("__xy_hi"), xy_lo.alias("__xy_lo"),
    )
    s = (
        j.groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hours"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum("y").cast("bigint").alias("sy"),
            fx.exact_sum_units("__xx_hi", "__xx_lo", 31).alias("sxx"),
            fx.exact_sum_units("__yy_hi", "__yy_lo", 31).alias("syy"),
            fx.exact_sum_units("__xy_hi", "__xy_lo", 31).alias("sxy"),
        )
    )
    n = F.col("n_hours")
    num = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy") / n
    den = F.sqrt(
        F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx") / n
    ) * F.sqrt(F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy") / n)
    return s.select(
        "type_a",
        "type_b",
        "n_hours",
        (F.round(num / den, 6) + F.lit(0.0)).alias("corr_counts"),
    ).orderBy("type_a", "type_b")


# --------------------------------------------------------------------------
# X38 — cumulative crossover detection (new round 4, the TPC-DS Q51
# archetype): track the running cumulative totals of two series
# ('click' vs 'view' hourly counts) and emit the hours where the lead
# CHANGES hands — the "when did web overtake store" business question.
# One spine, two running windows on the same hour ordering, a lag to
# detect the sign flip; all arithmetic on exact BIGINTs.
# --------------------------------------------------------------------------
@register(
    "x38_cumulative_crossover",
    oracle=f"""
    WITH h AS (
      SELECT (epoch_ns(ts) // {NS_PER_HOUR}) * {NS_PER_HOUR} AS hour_ns,
             CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS a,
             CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS b
      FROM events GROUP BY 1),
    c AS (
      SELECT hour_ns,
             SUM(a) OVER w AS ca, SUM(b) OVER w AS cb
      FROM h
      WINDOW w AS (ORDER BY hour_ns ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    s AS (
      SELECT hour_ns, ca, cb,
             CASE WHEN ca > cb THEN 1 WHEN ca < cb THEN -1 ELSE 0 END AS lead_sign,
             lag(CASE WHEN ca > cb THEN 1 WHEN ca < cb THEN -1 ELSE 0 END)
               OVER (ORDER BY hour_ns) AS prev_sign
      FROM c)
    SELECT CAST(hour_ns AS BIGINT) AS hour_ns,
           CAST(ca AS BIGINT) AS cum_click, CAST(cb AS BIGINT) AS cum_view,
           CAST(lead_sign AS BIGINT) AS lead_sign
    FROM s
    WHERE prev_sign IS NOT NULL AND lead_sign != prev_sign
    ORDER BY hour_ns
    """,
)
def x38_cumulative_crossover(spark, sf_dir):
    T = loader(sf_dir, spark)
    h = (
        T("events")
        .groupBy((F.col("ts") - F.col("ts") % NS_PER_HOUR).alias("hour_ns"))
        .agg(
            F.count(F.when(F.col("event_type") == "click", 1)).cast("bigint").alias("a"),
            F.count(F.when(F.col("event_type") == "view", 1)).cast("bigint").alias("b"),
        )
    )
    # The hourly census is tiny (one row per hour) — the single-partition
    # global window here is over aggregated data, the same spine class as
    # x7/x12, not over raw events.
    w = Window.orderBy("hour_ns").rowsBetween(Window.unboundedPreceding, 0)
    c = h.select(
        "hour_ns", F.sum("a").over(w).alias("ca"), F.sum("b").over(w).alias("cb")
    )
    sign = (
        F.when(F.col("ca") > F.col("cb"), 1).when(F.col("ca") < F.col("cb"), -1).otherwise(0)
    )
    s = c.select(
        "hour_ns",
        "ca",
        "cb",
        sign.alias("lead_sign"),
        F.lag(sign).over(Window.orderBy("hour_ns")).alias("prev_sign"),
    )
    return (
        s.where(F.col("prev_sign").isNotNull() & (F.col("lead_sign") != F.col("prev_sign")))
        .select(
            F.col("hour_ns").cast("bigint").alias("hour_ns"),
            F.col("ca").cast("bigint").alias("cum_click"),
            F.col("cb").cast("bigint").alias("cum_view"),
            F.col("lead_sign").cast("bigint").alias("lead_sign"),
        )
        .orderBy("hour_ns")
    )


# --------------------------------------------------------------------------
# X39 — burstiness / index of dispersion (new round 4): per event_type,
# the Fano factor (variance / mean) of hourly event counts over the
# zero-filled spine — 1 ≈ Poisson arrivals, >1 bursty, <1 regular; the
# one-number answer to "can I capacity-plan this stream on averages".
# All moments from exact BIGINT power sums over integer counts.
# --------------------------------------------------------------------------
@register(
    "x39_burstiness",
    oracle=f"""
    WITH bounds AS (
      SELECT (epoch_ns(min(ts)) // {NS_PER_HOUR}) * {NS_PER_HOUR} AS hmin,
             (epoch_ns(max(ts)) // {NS_PER_HOUR}) * {NS_PER_HOUR} AS hmax
      FROM events),
    grid AS (
      SELECT t.event_type, gs.h AS hour_ns
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(generate_series(hmin, hmax, {NS_PER_HOUR})) AS h
                  FROM bounds) gs),
    actual AS (
      SELECT event_type, (epoch_ns(ts) // {NS_PER_HOUR}) * {NS_PER_HOUR} AS hour_ns,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    spine AS (
      SELECT g.event_type, COALESCE(a.n, 0) AS n
      FROM grid g LEFT JOIN actual a
        ON g.event_type = a.event_type AND g.hour_ns = a.hour_ns),
    s AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
             CAST(SUM(n) AS BIGINT) AS s1, CAST(SUM(n * n) AS BIGINT) AS s2
      FROM spine GROUP BY event_type)
    SELECT event_type, n_hours,
           round(CAST(s1 AS DOUBLE) / n_hours, 6) AS mean_per_hour,
           round(((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_hours) / (n_hours - 1))
                 / (CAST(s1 AS DOUBLE) / n_hours), 6) + 0.0 AS fano
    FROM s
    ORDER BY event_type
    """,
)
def x39_burstiness(spark, sf_dir):
    T = loader(sf_dir, spark)
    ev = T("events")
    b = ev.agg(
        (F.min("ts") - F.min("ts") % NS_PER_HOUR).alias("hmin"),
        (F.max("ts") - F.max("ts") % NS_PER_HOUR).alias("hmax"),
    ).first()
    grid = ev.select("event_type").distinct().select(
        "event_type",
        F.explode(
            F.sequence(F.lit(int(b["hmin"])), F.lit(int(b["hmax"])), F.lit(NS_PER_HOUR))
        ).alias("hour_ns"),
    )
    actual = ev.groupBy(
        "event_type", (F.col("ts") - F.col("ts") % NS_PER_HOUR).alias("hour_ns")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    spine = grid.join(actual, ["event_type", "hour_ns"], "left").select(
        "event_type", F.coalesce("n", F.lit(0)).cast("bigint").alias("n")
    )
    # n² limb-split at 31 bits (x26's perf_smoke overflow class).
    from kompactor_spark import fixedpoint as fx

    nn_hi, nn_lo = fx.limb_split(F.col("n") * F.col("n"), 31)
    spine = spine.select(
        "event_type", "n", nn_hi.alias("__nn_hi"), nn_lo.alias("__nn_lo")
    )
    s = spine.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.sum("n").cast("bigint").alias("s1"),
        fx.exact_sum_units("__nn_hi", "__nn_lo", 31).alias("s2"),
    )
    nh, s1, s2 = F.col("n_hours"), F.col("s1").cast("double"), F.col("s2").cast("double")
    mean = s1 / nh
    var = (s2 - s1 * s1 / nh) / (nh - 1)
    return s.select(
        "event_type",
        "n_hours",
        F.round(mean, 6).alias("mean_per_hour"),
        (F.round(var / mean, 6) + F.lit(0.0)).alias("fano"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# X40 — maximum drawdown (new round 4): per user, the largest
# peak-to-trough fall of the running cumulative purchase value — the
# risk/finance primitive (how far below its best has this account
# been). Exactness: the cumulative series, its running peak, and every
# drawdown are DECIMAL sums/maxima over the (ts, event_id)-ordered
# window — no float anywhere until the final presentation cast, so the
# argmax is bit-deterministic. One keyed shuffle shared by both
# windows and the rollup.
# --------------------------------------------------------------------------
@register(
    "x40_max_drawdown",
    oracle="""
    WITH p AS (
      SELECT user_id, event_id, epoch_ns(ts) AS t,
             CAST(value AS DECIMAL(18,6)) - CAST(0.25 AS DECIMAL(18,6)) * 100 AS delta
      FROM events WHERE event_type = 'purchase'),
    cum0 AS (
      SELECT user_id, t, event_id,
             SUM(delta) OVER (PARTITION BY user_id ORDER BY t, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM p),
    c AS (
      SELECT user_id, cum,
             MAX(cum) OVER (PARTITION BY user_id ORDER BY t, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      FROM cum0)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(MAX(peak) AS DOUBLE) AS peak_cum,
           CAST(MAX(peak - cum) AS DOUBLE) AS max_drawdown
    FROM c GROUP BY user_id
    ORDER BY user_id
    """,
)
def x40_max_drawdown(spark, sf_dir):
    T = loader(sf_dir, spark)
    # signed per-purchase delta (value − 25.00): makes the cumulative
    # series non-monotone so drawdown is a real quantity on this data
    delta = F.col("value").cast("decimal(18,6)") - F.lit(25.0).cast("decimal(18,6)")
    p = (
        T("events")
        .where(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("t"), "event_id", delta.alias("delta"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = p.select(
        "user_id",
        "t",
        "event_id",
        F.sum("delta").over(w).alias("cum"),
    ).withColumn("peak", F.max("cum").over(w))
    return (
        c.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.max("peak").cast("double").alias("peak_cum"),
            F.max(F.col("peak") - F.col("cum")).cast("double").alias("max_drawdown"),
        )
        .orderBy("user_id")
    )
