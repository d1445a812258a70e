"""Distributed global prefix sums (no single-partition window).

A global running aggregate (``SUM(x) OVER (ORDER BY k)`` /
``row_number() OVER (ORDER BY k)`` with no PARTITION BY) is the classic
scale-killer: Spark plans it as one WindowExec over ONE partition, so
the whole table serializes through a single task. This module provides
the two-pass shape that computes the identical result distributed:

1. ``repartitionByRange`` on the ORDER BY keys — rows land in range
   buckets that are globally ordered across partitions (partition i
   holds keys that sort before partition i+1's keys);
2. a per-partition window cumsum (each partition is small and the
   window is keyed by ``spark_partition_id`` — no global sort barrier
   beyond the range shuffle itself);
3. per-partition totals (one tiny ``num_partitions``-row aggregate)
   turned into exclusive offsets by a window over that bounded frame,
   broadcast back and added to the local cumsums.

The result is byte-identical to the single-partition window as long as
the ORDER BY keys form a total order (caller must include a tiebreaker
key — e.g. a unique id — exactly as a deterministic oracle requires
anyway).

Consistency note (load-bearing): the cumsum pass and the totals pass
both read the range-shuffled frame, and ``repartitionByRange`` boundary
sampling is NOT deterministic across two plan instances — if each pass
sampled its own boundaries, a row's partition id in the cumsum pass
could disagree with the totals the offsets were built from (measured:
17k/20k wrong row_numbers when relying on exchange reuse alone). The
ranged frame is therefore ``localCheckpoint(eager=False)``-ed: it
materializes once, both passes read the same RDD, and the pids are
consistent by construction.

At 100 TB: the checkpoint materializes only the projected prefix-sum
input (order keys + values), the only degenerate window runs over
``num_partitions`` rows (bounded model-size state), and the data-plane
cost is one range shuffle — the same cost a global ORDER BY would pay
anyway. Any number of running sums over the SAME order share that one
shuffle+checkpoint (``distributed_cumsums``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__ps_pid"


def _as_cols(order_by) -> list[Column]:
    return [c if isinstance(c, Column) else F.col(c) for c in order_by]


def distributed_cumsums(
    df: DataFrame,
    order_by,
    values: dict[str, Column | str],
    num_partitions: int | None = None,
) -> DataFrame:
    """For each ``out_col -> value`` in ``values``, compute the global
    ``SUM(value) OVER (ORDER BY order_by ROWS UNBOUNDED PRECEDING ..
    CURRENT ROW)`` with the two-pass range-partition shape above — all
    sums share one range shuffle and one checkpoint.

    ``order_by`` may contain sort expressions (``F.col(..).desc()``);
    it MUST be a total order (include a unique tiebreaker). Each value
    is a column name or Column; its Spark sum type is preserved.
    Returns ``df`` plus the requested columns; row set and original
    columns unchanged.
    """
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    cols = _as_cols(order_by)
    vals = {
        name: (F.col(v) if isinstance(v, str) else v) for name, v in values.items()
    }

    # localCheckpoint: single materialization so the cumsum pass and the
    # totals pass see ONE consistent partitioning (see module docstring).
    ranged = (
        df.repartitionByRange(num_partitions, *cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_local = (
        Window.partitionBy(_PID)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.select(
        "*",
        *[F.sum(v).over(w_local).alias(f"__ps_local_{n}") for n, v in vals.items()],
    )

    totals = ranged.groupBy(_PID).agg(
        *[F.sum(v).alias(f"__ps_total_{n}") for n, v in vals.items()]
    )
    # Exclusive running totals over <= num_partitions rows — bounded
    # model state. Keyed on a degenerate non-foldable constant (pid % 1;
    # a plain literal would be constant-folded back to an empty spec) so
    # the WindowExec single-partition warning stays a reliable signal
    # for GENUINE full-data global windows elsewhere.
    w_off = (
        Window.partitionBy(F.col(_PID) % F.lit(1))
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        _PID,
        *[
            F.coalesce(F.sum(f"__ps_total_{n}").over(w_off), F.lit(0)).alias(
                f"__ps_off_{n}"
            )
            for n in vals
        ],
    )

    # The declared output type must match the global window's exactly
    # (SUM's aggregate type): local + offset widens decimals by 8 more
    # digits, so cast back — values always fit (every true prefix total
    # is bounded by the global SUM the window type already holds).
    sum_types = {
        n: df.select(F.sum(v).alias("__t")).schema["__t"].dataType
        for n, v in vals.items()
    }
    out = local.join(F.broadcast(offsets), _PID)
    for n in vals:
        out = out.withColumn(
            n,
            (F.col(f"__ps_local_{n}") + F.col(f"__ps_off_{n}")).cast(sum_types[n]),
        )
    return out.drop(
        _PID, *[f"__ps_local_{n}" for n in vals], *[f"__ps_off_{n}" for n in vals]
    )


def distributed_cumsum(
    df: DataFrame,
    order_by,
    value: Column | str,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Single-sum convenience wrapper over :func:`distributed_cumsums`."""
    return distributed_cumsums(df, order_by, {out_col: value}, num_partitions)


def distributed_row_number(
    df: DataFrame,
    order_by,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Global ``row_number() OVER (ORDER BY order_by)`` (1-based) via
    :func:`distributed_cumsum` over a constant 1 — same totality
    requirement on the keys."""
    return distributed_cumsum(
        df, order_by, F.lit(1).cast("long"), out_col, num_partitions
    )


def distributed_keyed_cumsums(
    df: DataFrame,
    keys: list[str],
    order_by,
    values: dict[str, Column | str],
    num_partitions: int | None = None,
) -> DataFrame:
    """``SUM(v) OVER (PARTITION BY keys ORDER BY order_by ROWS UNBOUNDED
    PRECEDING .. CURRENT ROW)`` for LOW-CARDINALITY keys, without
    serializing one sort task per key (the §7c pathology: a bare-key
    window over a full-data frame pins parallelism to #distinct keys at
    every scale — 20 sources at 100 TB = 20 tasks).

    Same two-pass range shape as :func:`distributed_cumsums`, with the
    key prepended to the range order so each partition holds a
    contiguous (key, order) slice: the per-partition window cumsum keys
    on ``(pid, *keys)`` (parallel over range slices), per-(pid, key)
    totals become exclusive carry-ins via a window over the model-sized
    keys x partitions frame, and the carry-ins broadcast back. NULL key
    values are one group, exactly like the window's PARTITION BY —
    the carry-in join is null-safe.

    ``keys`` must be plain column names. The caller-side contract is
    the same as the keyed window it replaces: ``order_by`` plus the
    keys must form a total order within each key (include a unique
    tiebreaker). Prefer the plain window when key cardinality ≫ cores
    (measured on x27: the distributed machinery is pure overhead at
    ~1500 keys); use this when keys are few and frames are corpus-sized.
    """
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    cols = _as_cols(order_by)
    vals = {
        name: (F.col(v) if isinstance(v, str) else v) for name, v in values.items()
    }

    # One materialization so the cumsum pass and the totals pass see ONE
    # consistent partitioning (repartitionByRange boundary sampling is
    # not deterministic across plan instances — module docstring).
    ranged = (
        df.repartitionByRange(num_partitions, *[F.col(k) for k in keys], *cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_local = (
        Window.partitionBy(_PID, *keys)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.select(
        "*",
        *[F.sum(v).over(w_local).alias(f"__ps_local_{n}") for n, v in vals.items()],
    )

    totals = ranged.groupBy(_PID, *keys).agg(
        *[F.sum(v).alias(f"__ps_total_{n}") for n, v in vals.items()]
    )
    # Exclusive carry-ins over the keys x partitions frame — bare-key
    # window, but MODEL-SIZED input (the rule SCALE.md's §7c audit
    # enforces).
    w_off = (
        Window.partitionBy(*keys)
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        _PID,
        *keys,
        *[
            F.coalesce(F.sum(f"__ps_total_{n}").over(w_off), F.lit(0)).alias(
                f"__ps_off_{n}"
            )
            for n in vals
        ],
    )

    sum_types = {
        n: df.select(F.sum(v).alias("__t")).schema["__t"].dataType
        for n, v in vals.items()
    }
    off = offsets
    for k in keys:
        off = off.withColumnRenamed(k, f"__ps_k_{k}")
    cond = F.col(f"l.{_PID}") == F.col(f"r.{_PID}")
    for k in keys:
        # null-safe: a NULL key is one PARTITION BY group
        cond = cond & F.col(f"l.{k}").eqNullSafe(F.col(f"r.__ps_k_{k}"))
    out = local.alias("l").join(F.broadcast(off.alias("r")), cond).drop(
        f"r.{_PID}", *[f"__ps_k_{k}" for k in keys]
    )
    # drop() with qualified names is unreliable across versions — select
    # the left side plus the computed columns explicitly
    out = out.select(
        *[F.col(f"l.{c}") for c in local.columns],
        *[F.col(f"r.__ps_off_{n}") for n in vals],
    )
    for n in vals:
        out = out.withColumn(
            n,
            (F.col(f"__ps_local_{n}") + F.col(f"__ps_off_{n}")).cast(sum_types[n]),
        )
    return out.drop(
        _PID, *[f"__ps_local_{n}" for n in vals], *[f"__ps_off_{n}" for n in vals]
    )


def distributed_keyed_row_number(
    df: DataFrame,
    keys: list[str],
    order_by,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """``row_number() OVER (PARTITION BY keys ORDER BY order_by)``
    (1-based) via :func:`distributed_keyed_cumsums` over a constant 1."""
    return distributed_keyed_cumsums(
        df, keys, order_by, {out_col: F.lit(1).cast("long")}, num_partitions
    )
