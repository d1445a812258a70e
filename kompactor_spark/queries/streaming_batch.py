"""Streaming window semantics, batch-equivalence side (SURVEY §2.B
X1-X3).

These queries compute tumbling / sliding / session windows over the
events table with BATCH DataFrames — the exact aggregations the
Structured Streaming jobs in kompactor_spark/streaming produce
incrementally. The B-class incremental tests live in
tests/test_streaming.py; here the oracle checks the window semantics.

All window math is int64 ns arithmetic (engine time policy): no
timestamp types cross the comparison boundary.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kompactor_spark.queries import register
from kompactor_spark.tables import loader
from kompactor_spark.timeutil import NS_PER_HOUR, NS_PER_MINUTE, ns_bucket

_SLIDE = 15 * NS_PER_MINUTE
_GAP = 30 * NS_PER_MINUTE


# --------------------------------------------------------------------------
# X1 — tumbling 1-hour window: count + sum(value) per (window, type).
# value is double → decimal(18,6) cast before SUM on both engines.
# --------------------------------------------------------------------------
@register(
    "x1_tumbling_window",
    oracle="""
    SELECT epoch_ns(time_bucket(INTERVAL '1 hour', ts)) AS window_start_ns,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start_ns, event_type
    """,
)
def x1_tumbling_window(spark, sf_dir):
    T = loader(sf_dir, spark)
    return (
        T("events")
        .groupBy(
            ns_bucket(F.col("ts"), NS_PER_HOUR).alias("window_start_ns"),
            "event_type",
        )
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .orderBy("window_start_ns", "event_type")
    )


# --------------------------------------------------------------------------
# X2 — sliding window (1 h window, 15 min slide): each event lands in 4
# windows. Spark: explode the 4 candidate window starts (same expansion
# Structured Streaming's window() performs); oracle: zipped unnest.
# --------------------------------------------------------------------------
@register(
    "x2_sliding_window",
    oracle=f"""
    WITH expanded AS (
      SELECT epoch_ns(time_bucket(INTERVAL '15 minutes', ts))
               - unnest(generate_series(0, 3)) * {_SLIDE} AS window_start_ns,
             value
      FROM events
    )
    SELECT window_start_ns,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM expanded
    GROUP BY window_start_ns
    ORDER BY window_start_ns
    """,
)
def x2_sliding_window(spark, sf_dir):
    T = loader(sf_dir, spark)
    base = ns_bucket(F.col("ts"), _SLIDE)
    starts = F.array(*[(base - F.lit(k * _SLIDE)).cast("long") for k in range(4)])
    return (
        T("events")
        .select(F.explode(starts).alias("window_start_ns"), "value")
        .groupBy("window_start_ns")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .orderBy("window_start_ns")
    )


# --------------------------------------------------------------------------
# X3 — session windows (30 min gap) per user: gaps-and-islands on both
# sides (the composition Spark's session_window materializes).
# --------------------------------------------------------------------------
@register(
    "x3_session_window",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, epoch_ns(ts) AS ts_ns,
             CASE WHEN epoch_ns(ts) - lag(epoch_ns(ts))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id) > {_GAP}
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts_ns,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_ns
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           min(ts_ns) - min(ts_ns) % 1000 AS session_start_ns,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def x3_session_window(spark, sf_dir):
    T = loader(sf_dir, spark)
    # µs-floor FIRST (the oracle only ever sees µs-truncated timestamps;
    # raw-ns ordering/gap deltas would diverge under a TIMESTAMP(NANOS)
    # encoding round — ADVICE r3 ordering-sensitivity class)
    ev = T("events").select(
        "user_id", (F.col("ts") - F.col("ts") % 1000).alias("ts_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    w_run = Window.partitionBy("user_id").orderBy("ts_us").rowsBetween(Window.unboundedPreceding, 0)
    marked = ev.select(
        "user_id",
        "ts_us",
        F.when(F.col("ts_us") - F.lag("ts_us").over(w) > _GAP, 1).otherwise(0).alias("new_session"),
    )
    sessions = marked.withColumn("session_id", F.sum("new_session").over(w_run))
    return (
        sessions.groupBy("user_id", F.col("session_id").cast("bigint").alias("session_id"))
        .agg(
            F.min("ts_us").alias("session_start_ns"),
            F.count("*").cast("bigint").alias("n_events"),
        )
        .orderBy("user_id", "session_id")
    )


# --------------------------------------------------------------------------
# X9 — stream-stream join, batch twin: same-user error↔signup pairs
# within a 24 h lookback (the streaming form in streaming/jobs.py runs
# this plan incrementally with watermarked state; H-checked here)
# --------------------------------------------------------------------------
@register(
    "x9_interval_join",
    oracle="""
    SELECT e.event_id AS err_id, e.user_id, s.event_id AS signup_id,
           epoch_ns(e.ts) AS err_ts, epoch_ns(s.ts) AS signup_ts
    FROM events e
    JOIN events s
      ON e.user_id = s.user_id
     AND s.ts <= e.ts
     AND s.ts >= e.ts - INTERVAL 24 HOURS
    WHERE e.event_type = 'error' AND s.event_type = 'signup'
    ORDER BY err_id, signup_id
    """,
)
def x9_interval_join(spark, sf_dir):
    from kompactor_spark.operators.rangejoin import binned_interval_join

    T = loader(sf_dir, spark)
    # µs-floor before the lookback predicate — the oracle compares
    # µs-truncated timestamps (same class as j14)
    ev = T("events").withColumn("ts", F.col("ts") - F.col("ts") % 1000)
    day_ns = 24 * 3600 * 1_000_000_000
    # (user, 24h-bucket) composite binned join — the batch twin of the
    # streaming plan in streaming/jobs.py::error_signup_join, re-keyed
    # for history scale: the streaming engine bounds its state to the
    # lookback via watermarks, and the composite bucket key gives the
    # batch plan the SAME bound (a plain user-keyed join is quadratic
    # in each user's history length — measured 83 s vs 3.4 s at sf10,
    # where the corpus has 100x the history at constant event density).
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("err_ts"),
        (F.col("ts") - F.lit(day_ns)).alias("__lb_start"),
    )
    signups = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("signup_ts"),
        F.col("ts").alias("__s_ts"),
    )
    joined = binned_interval_join(
        signups,
        errors,
        "__s_ts",
        "__lb_start",
        "err_ts",
        bucket_ns=day_ns,
        extra_keys=[("s_user", "e_user")],
    )
    return joined.select(
        "err_id", F.col("s_user").alias("user_id"), "signup_id", "err_ts", "signup_ts"
    ).orderBy("err_id", "signup_id")
