"""Exact distributed quantiles via order statistics (no value-map buffer).

Why not ``F.percentile``
------------------------
Spark's exact ``percentile`` aggregate accumulates an OpenHashMap of
``value -> count`` per partition and merges ALL of them into one buffer
on the final reducer. For low-cardinality inputs that is fine; for a
nearly-distinct numeric column (prices, latencies, scores) the final
buffer holds every distinct value in one JVM task — memory grows with
the DATA, not the model, which is exactly the failure mode a 100 TB
engine must not have. (Locally it is also no faster: 2.7 s on 1.5M
mostly-distinct doubles at sf1.)

The scalable exact shape is order statistics over a range shuffle, with
the rank bookkeeping kept OFF the data path:

1. ``repartitionByRange`` on the column and ``localCheckpoint`` — rows
   land in globally ordered range buckets, materialized once (any
   caller second pass over the same data reuses this, no re-scan);
2. per-partition row counts (one tiny aggregate) — the driver turns the
   requested percentile positions into at most ``2 * len(probs)``
   ``(partition, local_rank)`` targets (bounded model state);
3. ONE targeted job sorts only the hit partitions
   (``row_number() OVER (PARTITION BY pid ORDER BY col)`` after a
   partition filter) and collects the boundary values;
4. the driver interpolates with EXACTLY Spark's ``percentile`` formula
   ``lower + (pos - floor(pos)) * (higher - lower)``
   (Percentile.getPercentile), which the repo's a9 row proved
   bit-compatible with DuckDB's ``quantile_cont`` on the driver's own
   grading data.

Design note: a first cut used ``distributed_row_number``
(operators/prefixsum.py) to rank EVERY row, but a global rank column is
more work than the question needs — only ~18 order statistics are ever
read, so windowing all partitions and broadcasting partition offsets
(measured 3.5 s vs this shape's ~2.0 s on the a22 caller at sf1) buys
nothing. The prefix-sum op remains the right tool when every row needs
its running value (l6_token_budget, w14, w15).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "__oq_pid"
_LR = "__oq_lr"


def exact_quantiles(
    df: DataFrame,
    col: str,
    probs: list[float],
    num_partitions: int | None = None,
) -> tuple[list[float], DataFrame]:
    """Exact interpolated quantiles of ``df[col]`` (NULLs excluded, like
    the SQL aggregates). Returns ``(cuts, ranged)`` where ``cuts[i]``
    equals ``percentile(col, probs[i])`` bit-for-bit and ``ranged`` is
    the checkpointed range-partitioned frame (original columns) for an
    optional second pass over the same materialization.
    """
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    vals = df.where(F.col(col).isNotNull())
    ranged = vals.repartitionByRange(num_partitions, F.col(col)).localCheckpoint(
        eager=False
    )

    # Pass 1 (tiny): per-range-partition counts -> driver-side rank map.
    counts = {
        int(r[_PID]): int(r["c"])
        for r in ranged.groupBy(F.spark_partition_id().alias(_PID))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    n = sum(counts.values())
    if n == 0:
        return [float("nan") for _ in probs], ranged

    positions = [(n - 1) * q for q in probs]
    wanted: set[int] = set()  # 1-based global ranks
    for pos in positions:
        wanted.add(int(math.floor(pos)) + 1)
        wanted.add(int(math.ceil(pos)) + 1)

    # Global rank -> (partition, local rank); partitions are globally
    # ordered by construction of repartitionByRange.
    targets: dict[int, tuple[int, int]] = {}
    base = 0
    for pid in sorted(counts):
        c = counts[pid]
        for rank in wanted:
            if base < rank <= base + c:
                targets[rank] = (pid, rank - base)
        base += c

    # Pass 2 (targeted): sort ONLY the <= 2*len(probs) hit partitions.
    hit_pids = sorted({pid for pid, _ in targets.values()})
    pred = None
    for rank, (pid, lr) in targets.items():
        term = (F.col(_PID) == pid) & (F.col(_LR) == lr)
        pred = term if pred is None else (pred | term)
    w = Window.partitionBy(_PID).orderBy(col)
    boundary = (
        ranged.withColumn(_PID, F.spark_partition_id())
        .where(F.col(_PID).isin(hit_pids))
        .withColumn(_LR, F.row_number().over(w))
        .where(pred)
        .select(_PID, _LR, col)
        .collect()  # <= 2*len(probs) rows — bounded model state
    )
    by_local = {(int(r[_PID]), int(r[_LR])): float(r[col]) for r in boundary}
    by_rank = {rank: by_local[t] for rank, t in targets.items()}

    cuts = []
    for pos in positions:
        lo, hi = int(math.floor(pos)), int(math.ceil(pos))
        v_lo = by_rank[lo + 1]
        # Spark Percentile.getPercentile: lower + (pos - lower_rank) *
        # (higher - lower); exact same double ops here (bit parity).
        cuts.append(v_lo if hi == lo else v_lo + (pos - lo) * (by_rank[hi + 1] - v_lo))
    return cuts, ranged
