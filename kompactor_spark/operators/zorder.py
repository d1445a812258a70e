"""Z-order (Morton-curve) clustering for multi-dimensional file skipping.

A time-sorted layout (the compactor's default, reference
kompactor.ts:254-257) gives perfect min/max skipping on `time` and
none on anything else. Interleaving the bits of several rank-scaled
dimensions into one sort key (the trick behind Delta's OPTIMIZE
ZORDER BY and Iceberg's z-ordering rewrite) makes every written file
cover a small hyper-rectangle of the key space, so parquet footer
min/max stats prune files for predicates on ANY of the z-ordered
dimensions — the difference between scanning 1/1000th and scanning
everything when a 100 TB table is queried by a non-time key.

Everything is JVM-side expression work: a broadcast 1-row min/max
aggregate scales each dimension to ``bits`` bits, and a higher-order
``aggregate`` over bit positions interleaves them. No Python in the
row path, no global sort — ``repartitionByRange`` samples the z-key
and range-partitions, which is exactly a distributed bucketed sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interleave_bits(cols: list, bits: int = 16):
    """Morton-interleave the low ``bits`` bits of the given integer
    Columns: bit j of column c lands at position j * ncols + c (LSB
    first), so all columns contribute equally at every scale of the
    curve. Returns a long Column."""
    n = len(cols)
    acc = F.lit(0).cast("long")
    expr = acc
    for j in range(bits):
        for c_idx, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), j).bitwiseAND(F.lit(1))
            expr = expr.bitwiseOR(F.shiftleft(bit, j * n + c_idx))
    return expr


def zvalue(df: DataFrame, cols: list[str], bits: int = 16):
    """df + a ``__zvalue`` column: each dimension min/max-scaled to
    [0, 2^bits) via one broadcast global aggregate, then interleaved.

    Min/max scaling assumes roughly uniform dimensions (true for ids
    and event time); heavily skewed dimensions would want equi-depth
    (approx-quantile) scaling instead — same interleave, different
    rank function.
    """
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
    stats = df.agg(*aggs)
    out = df.join(F.broadcast(stats))
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        lo, hi = F.col(f"__min_{c}").cast("double"), F.col(f"__max_{c}").cast("double")
        span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
        scaled.append(
            F.least(
                F.lit(top),
                F.floor((F.col(c).cast("double") - lo) / span * top).cast("long"),
            )
        )
    out = out.withColumn("__zvalue", interleave_bits(scaled, bits))
    return out.drop(*[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols])


def zorder_layout(df: DataFrame, cols: list[str], num_files: int, bits: int = 16) -> DataFrame:
    """Cluster rows for writing: range-partition by z-value into
    ``num_files`` partitions and sort within each, so every output
    file covers one compact segment of the Morton curve. Write with
    ``result.write.parquet(...)`` — one file per partition."""
    z = zvalue(df, cols, bits)
    return z.repartitionByRange(num_files, "__zvalue").sortWithinPartitions("__zvalue").drop(
        "__zvalue"
    )
