"""Interval sweep-line primitives: peak concurrency and merged-interval
coverage over arbitrary (key, start, end) interval frames.

Both are single-keyed-window shapes (see SCALE.md §7b): pointize to ±1
deltas / break-flag islands, one running window per key, rollups reuse
the same hash partitioning. Used by the x23/x27 registered queries and
property-tested against brute-force references on arbitrary generated
intervals (tests/test_properties.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def peak_concurrency(
    intervals: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Per key: the maximum number of simultaneously open [start, end)
    intervals and the earliest instant it is first reached.

    Half-open tie discipline: an interval ending at t closes before one
    starting at t opens (closes sort before opens at the same instant;
    the default RANGE frame includes all peers of the (t, d) ordering
    key identically in any ANSI engine).
    """
    k, s, e = F.col(key_col), F.col(start_col), F.col(end_col)
    pts = intervals.select(k.alias("k"), s.alias("t"), F.lit(1).alias("d")).unionByName(
        intervals.select(k.alias("k"), e.alias("t"), F.lit(-1).alias("d"))
    )
    w_run = Window.partitionBy("k").orderBy("t", "d")
    w_all = Window.partitionBy("k")
    run = pts.withColumn("c", F.sum("d").over(w_run))
    return (
        run.withColumn("peak", F.max("c").over(w_all))
        .where(F.col("c") == F.col("peak"))
        .groupBy("k")
        .agg(
            F.max("c").cast("bigint").alias("peak_concurrency"),
            F.min("t").cast("bigint").alias("first_peak"),
        )
        .withColumnRenamed("k", key_col)
    )


def interval_coverage(
    intervals: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Per key: the number of disjoint islands in the union of [start,
    end) intervals and the total length covered by that union (exact in
    the start/end integer domain).

    `tiebreak_col` must be unique per row so the ROWS-frame order is
    total (identical across engines and partitionings).
    """
    k = F.col(key_col)
    iv = intervals.select(
        k.alias("k"),
        F.col(tiebreak_col).alias("tb"),
        F.col(start_col).alias("t"),
        F.col(end_col).alias("e"),
    )
    w_prev = (
        Window.partitionBy("k").orderBy("t", "tb").rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("k").orderBy("t", "tb").rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_end = F.max("e").over(w_prev)
    brk = F.when(prev_end.isNull() | (F.col("t") > prev_end), 1).otherwise(0)
    isl = iv.withColumn("island", F.sum(brk).over(w_run))
    return (
        isl.groupBy("k", "island")
        .agg(F.min("t").alias("s"), F.max("e").alias("en"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_islands"),
            F.sum(F.col("en") - F.col("s")).cast("bigint").alias("covered"),
        )
        .withColumnRenamed("k", key_col)
    )
