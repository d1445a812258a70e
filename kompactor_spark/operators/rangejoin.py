"""Binned point-in-interval join (scalable range join).

A point-in-interval predicate has no equi-key, so Catalyst can only
plan it as BroadcastNestedLoopJoin / CartesianProduct — O(points ×
intervals) work that is fine at 60k rows and fatal at 100 TB. The
standard fix (used by Databricks' range-join binning and Flink's
interval join) is to quantize time into fixed buckets:

- each point belongs to exactly ONE bucket;
- each interval is exploded to the few buckets it overlaps
  (``(len / bucket_ns) + 1`` rows — bounded when interval length is);
- the join becomes an EQUI-join on bucket id, shuffle-partitioned and
  AQE-skew-splittable like any other, with the exact range predicate
  kept as a cheap residual filter.

Pair uniqueness is structural: a point matches an interval in at most
one bucket (the point's own), so no post-join dedup is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kompactor_spark.timeutil import ns_floor_div

_BUCKET = "__range_bucket"
_SALT = "__range_salt"


def binned_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_ns: int,
    how: str = "inner",
    n_salt: int = 1,
    extra_keys: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Join each point (ns-long ``point_ts``) to every interval with
    ``start_col <= point_ts <= end_col`` (ns longs, inclusive).

    ``bucket_ns`` trades shuffle fan-out for residual selectivity:
    pick it near the TYPICAL interval length so intervals explode to
    ~2 buckets. Column names must be disjoint between the two inputs.

    ``extra_keys`` adds entity equi-keys to the bucket join —
    ``[(point_col, interval_col), ...]`` pairs that must ALSO match.
    This is the per-entity lookback shape (each error joins same-USER
    signups in the preceding 24 h): joining on the entity alone is
    quadratic in that entity's history length, and joining on the time
    bucket alone is quadratic in per-bucket traffic across all
    entities — the composite (entity, bucket) key bounds candidates to
    one entity's one-or-two adjacent windows, which is the only shape
    whose candidate count stays LINEAR as history grows (the j14
    lesson applied to stream-join lookbacks; measured on x9 at sf10:
    the plain user-keyed join went quadratic with 100x history while
    this stays flat).

    ``n_salt`` > 1 splits each bucket into sub-keys for SKEW: the
    explicit repartition below exempts this exchange from AQE's
    coalescing — and therefore also from AQE's skew-split — so a single
    hot bucket (one incident window covering a traffic spike) would
    otherwise pin one straggler task. With salting, each point takes a
    deterministic salt (hash of its timestamp) and each interval-bucket
    row replicates to all ``n_salt`` sub-keys — interval-side rows are
    the SMALL side (bounded per bucket), so the replication cost is
    n_salt × intervals, while the hot points spread across n_salt tasks.
    """
    # Pin the join's width with an explicit repartition on the bucket
    # key. This is an EXPANSION join — output rows >> input rows — and
    # AQE sizes (and coalesces) post-shuffle partitions from the map
    # outputs of the INPUT, so a few-MB events table collapses the join
    # to 1-2 partitions that then each produce millions of rows on one
    # core (measured: 14M-pair join+write at sf1 ran 2 tasks wide).
    # A user-specified partition count is exempt from AQE coalescing;
    # the join reuses this distribution, so no extra exchange appears.
    from kompactor_spark.operators.expansion import pin_expansion_width

    p = points.withColumn(_BUCKET, ns_floor_div(F.col(point_ts), bucket_ns))
    i = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                ns_floor_div(F.col(start_col), bucket_ns),
                ns_floor_div(F.col(end_col), bucket_ns),
            )
        ),
    )
    keys = extra_keys or []
    if n_salt > 1:
        p = p.withColumn(_SALT, F.pmod(F.xxhash64(F.col(point_ts)), F.lit(n_salt)))
        i = i.withColumn(_SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
        p = pin_expansion_width(p, [_BUCKET, _SALT] + [pk for pk, _ in keys])
        cond = (
            (p[_BUCKET] == i[_BUCKET])
            & (p[_SALT] == i[_SALT])
            & (p[point_ts] >= i[start_col])
            & (p[point_ts] <= i[end_col])
        )
        for pk, ik in keys:
            cond = cond & (p[pk] == i[ik])
        return p.join(i, cond, how).drop(_BUCKET, _SALT)
    p = pin_expansion_width(p, [_BUCKET] + [pk for pk, _ in keys])
    cond = (
        (p[_BUCKET] == i[_BUCKET])
        & (p[point_ts] >= i[start_col])
        & (p[point_ts] <= i[end_col])
    )
    for pk, ik in keys:
        cond = cond & (p[pk] == i[ik])
    return p.join(i, cond, how).drop(_BUCKET)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_ns: int,
) -> DataFrame:
    """Join interval pairs that OVERLAP: ``l_start <= r_end AND
    r_start <= l_end`` (ns longs, inclusive) — the interval×interval
    sibling of ``binned_interval_join``'s point-in-interval.

    Same binning idea, one extra subtlety: a pair can share MANY
    buckets, so a naive explode×explode join emits duplicates. Instead
    of a post-join DISTINCT (a full extra shuffle of the output), each
    pair is claimed exactly once by its CANONICAL bucket — the bucket
    of ``max(l_start, r_start)``: both sides explode to their covered
    buckets as usual, and the residual keeps only the bucket that
    equals the canonical one. Structural uniqueness, zero dedup pass.
    """
    from kompactor_spark.operators.expansion import pin_expansion_width

    lb = "__l_bucket"
    le = left.withColumn(
        lb,
        F.explode(
            F.sequence(
                ns_floor_div(F.col(l_start), bucket_ns),
                ns_floor_div(F.col(l_end), bucket_ns),
            )
        ),
    )
    le = pin_expansion_width(le, [lb])  # expansion join: pin width (see above)
    rb = "__r_bucket"
    ri = right.withColumn(
        rb,
        F.explode(
            F.sequence(
                ns_floor_div(F.col(r_start), bucket_ns),
                ns_floor_div(F.col(r_end), bucket_ns),
            )
        ),
    )
    canonical = ns_floor_div(F.greatest(le[l_start], ri[r_start]), bucket_ns)
    cond = (
        (le[lb] == ri[rb])
        & (le[lb] == canonical)  # claim each pair exactly once
        & (le[l_start] <= ri[r_end])
        & (ri[r_start] <= le[l_end])
    )
    return le.join(ri, cond, "inner").drop(lb, rb)
