"""As-of join (SURVEY §2.B J8).

For each left row, attach the latest right row with
``right_ts <= left_ts`` (backward as-of, inclusive) sharing the join
key — the semantics of DuckDB's ``ASOF LEFT JOIN`` oracle.

Spark-first design: a range join (``l.ts >= r.ts``) explodes
quadratically per key and forces a broadcast-nested-loop at scale.
Instead: tag both sides, UNION, and take a running ``last(payload)``
window per key ordered by (ts, side) — ONE shuffle on the key, linear
work, arbitrarily many keys. This is the standard log-merge shape used
by stream processors for temporal joins.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RESERVED = {"_asof_ts", "_asof_side", "_asof_right", "_asof_match"}


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
) -> DataFrame:
    """Backward inclusive as-of left join.

    Output: all left columns + right's columns (minus the key). Right
    columns are NULL when no prior-or-equal right row exists. Column
    names of the two sides (besides ``on``) must be disjoint.

    Tie note: among RIGHT rows sharing the exact match timestamp the
    winner is unspecified (same as DuckDB ASOF) — project only columns
    that are functionally determined by (key, ts) if ties are possible,
    or pre-dedup the right side to one row per (key, ts).
    """
    left_payload_cols = [c for c in left.columns if c != on]
    right_payload_cols = [c for c in right.columns if c != on]
    overlap = set(left_payload_cols) & set(right_payload_cols)
    if overlap:
        raise ValueError(f"asof_join requires disjoint non-key columns, overlap: {sorted(overlap)}")
    clash = _RESERVED & set(left.columns) | _RESERVED & set(right.columns)
    if clash:
        raise ValueError(f"asof_join reserves column names {sorted(clash)}")

    # Shuffle-payload discipline (VERDICT r5 #4): left payload columns
    # ride the union FLAT (unionByName fills them with NULL on right
    # rows — a null-bitmap bit each, not a struct header per row), and
    # only the right payload is wrapped — because it must travel through
    # last(ignorenulls) as ONE value. When the right payload is a single
    # column, even that wrapper is dropped. SAFETY (ADVICE r6): dropping
    # the wrapper is only sound because right_payload_cols always
    # contains right_ts (it is every right column except the key), so
    # single_right implies the lone payload IS right_ts — which is never
    # NULL on a usable right row (a NULL-ts row can never match), so
    # last(ignorenulls) cannot skip a real match. If payload selection
    # ever excludes right_ts, keep the struct wrapper for any nullable
    # single payload or ignorenulls would return a stale older row.
    single_right = len(right_payload_cols) == 1
    if single_right and right_payload_cols != [right_ts]:
        # kernel guard (survives python -O, unlike assert): the
        # unwrapped single-payload fast path is only NULL-safe when the
        # lone payload IS the right timestamp (see SAFETY note above)
        raise ValueError(
            "as-of join invariant violated: single right payload column "
            f"{right_payload_cols!r} is not the right timestamp {right_ts!r}; "
            "the unwrapped last(ignorenulls) carry would skip NULL payloads"
        )
    right_carry = (
        F.col(right_payload_cols[0])
        if single_right
        else F.struct(*[F.col(c) for c in right_payload_cols])
    )
    l_tagged = left.select(
        F.col(on),
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
        *[F.col(c) for c in left_payload_cols],
    )
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        right_carry.alias("_asof_right"),
    )

    # side=0 (right) sorts before side=1 (left) at equal ts → inclusive match.
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_asof_ts").asc(), F.col("_asof_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l_tagged.unionByName(r_tagged, allowMissingColumns=True)
        .withColumn("_asof_match", F.last("_asof_right", ignorenulls=True).over(w))
        .where(F.col("_asof_side") == 1)
    )

    out_cols: list[Column] = [F.col(on)]
    out_cols += [F.col(c) for c in left_payload_cols]
    if single_right:
        out_cols += [F.col("_asof_match").alias(right_payload_cols[0])]
    else:
        out_cols += [F.col(f"_asof_match.{c}").alias(c) for c in right_payload_cols]
    return matched.select(*out_cols)


def asof_join_split(
    source: DataFrame,
    on: str,
    ts: str,
    left_when: Column,
    right_when: Column,
    left_cols: Sequence[str],
    left_ts_name: str,
    right_ts_name: str,
    forward: bool = False,
) -> DataFrame:
    """As-of join whose two sides are FILTERS OF THE SAME FRAME — the
    event-stream shape (latest signup before each error, next purchase
    after each error): both sides of the temporal join come from one
    event table split by a type predicate.

    Equivalent to::

        asof_join(source.where(left_when)
                        .select(on, *left_cols, F.col(ts).alias(left_ts_name)),
                  source.where(right_when)
                        .select(on, F.col(ts).alias(right_ts_name)),
                  on, left_ts_name, right_ts_name)

    but built from ONE scan: ``asof_join`` composed over two filters of
    the same table scans it twice (Catalyst does not fuse a
    union-of-filters back into one scan), and at sf10 the second events
    pass is ~50% of the whole join's runtime. Here the tagged union
    that feeds the window merge is a single scan with an isin-style
    filter and a conditional projection — left payload columns are
    NULLed on right rows, the right carry is NULLed on left rows —
    then the identical one-keyed-shuffle window merge.

    PRECONDITION: ``left_when`` and ``right_when`` must be mutually
    exclusive (they are type-tag predicates in every known caller). A
    row matching both is tagged LEFT (``F.when`` order) — it cannot
    also serve as a match candidate, unlike the two-frame composition
    where it would appear on both sides of the union.

    The right side carries only its timestamp (``right_ts_name``) —
    the bounded shape all j8-family queries use; use ``asof_join`` /
    ``asof_join_forward`` when the right payload is wider or the sides
    are genuinely different frames.
    """
    clash = _RESERVED & set(source.columns)
    if clash:
        raise ValueError(f"asof_join_split reserves column names {sorted(clash)}")
    if on in left_cols or ts in left_cols:
        raise ValueError("left_cols must not repeat the key or ts column")

    # backward: right(0) sorts before left(1) at equal ts -> inclusive
    # forward:  left(0) sorts before right(1) at equal ts -> inclusive
    left_tag, right_tag = (0, 1) if forward else (1, 0)
    u = source.where(left_when | right_when).withColumn(
        "_asof_side",
        F.when(left_when, F.lit(left_tag)).otherwise(F.lit(right_tag)),
    )
    is_left = F.col("_asof_side") == left_tag
    u = u.select(
        F.col(on),
        F.col(ts).alias("_asof_ts"),
        F.col("_asof_side"),
        *[F.when(is_left, F.col(c)).alias(c) for c in left_cols],
        F.when(~is_left, F.col(ts)).alias("_asof_right"),
    )
    if forward:
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("_asof_ts").asc(), F.col("_asof_side").asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        match = F.first("_asof_right", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("_asof_ts").asc(), F.col("_asof_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        match = F.last("_asof_right", ignorenulls=True).over(w)
    return (
        u.withColumn("_asof_match", match)
        .where(is_left)
        .select(
            F.col(on),
            *[F.col(c) for c in left_cols],
            F.col("_asof_ts").alias(left_ts_name),
            F.col("_asof_match").alias(right_ts_name),
        )
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
) -> DataFrame:
    """Forward inclusive as-of left join: for each left row, the
    EARLIEST right row with ``right_ts >= left_ts`` sharing the key
    (the "next event after" direction — time-to-resolution, next-restock
    lookups). Same union+window mechanism as the backward join, with
    the running ``last`` over preceding rows replaced by a ``first``
    over following rows; at equal ts the right row sorts after the left
    row so the match is inclusive. One shuffle on the key.
    """
    left_payload_cols = [c for c in left.columns if c != on]
    right_payload_cols = [c for c in right.columns if c != on]
    overlap = set(left_payload_cols) & set(right_payload_cols)
    if overlap:
        raise ValueError(f"asof_join_forward requires disjoint non-key columns, overlap: {sorted(overlap)}")
    clash = _RESERVED & set(left.columns) | _RESERVED & set(right.columns)
    if clash:
        raise ValueError(f"asof_join_forward reserves column names {sorted(clash)}")

    # Same flat-union payload discipline as asof_join (see above),
    # including the single_right => payload is right_ts invariant.
    single_right = len(right_payload_cols) == 1
    if single_right and right_payload_cols != [right_ts]:
        # kernel guard (survives python -O, unlike assert): the
        # unwrapped single-payload fast path is only NULL-safe when the
        # lone payload IS the right timestamp (see SAFETY note above)
        raise ValueError(
            "as-of join invariant violated: single right payload column "
            f"{right_payload_cols!r} is not the right timestamp {right_ts!r}; "
            "the unwrapped last(ignorenulls) carry would skip NULL payloads"
        )
    right_carry = (
        F.col(right_payload_cols[0])
        if single_right
        else F.struct(*[F.col(c) for c in right_payload_cols])
    )
    l_tagged = left.select(
        F.col(on),
        F.col(left_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),  # left BEFORE right at equal ts → inclusive
        *[F.col(c) for c in left_payload_cols],
    )
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
        right_carry.alias("_asof_right"),
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_asof_ts").asc(), F.col("_asof_side").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    matched = (
        l_tagged.unionByName(r_tagged, allowMissingColumns=True)
        .withColumn("_asof_match", F.first("_asof_right", ignorenulls=True).over(w))
        .where(F.col("_asof_side") == 0)
    )
    out_cols: list[Column] = [F.col(on)]
    out_cols += [F.col(c) for c in left_payload_cols]
    if single_right:
        out_cols += [F.col("_asof_match").alias(right_payload_cols[0])]
    else:
        out_cols += [F.col(f"_asof_match.{c}").alias(c) for c in right_payload_cols]
    return matched.select(*out_cols)
