"""Nanosecond-time helpers.

The engine's time policy (SURVEY §1.2, §7 risk 1): time is int64 epoch
nanoseconds end-to-end, exactly as the reference's data plane
(kompactor.ts:107 sorts int64 `time`; README.md:80 shows ~1.74e18 ns
epochs). Spark TimestampType is µs, and float64 cannot hold ns epochs
(reference bug B3, kompactor.ts:276-277) — so all arithmetic stays on
LongType columns; conversion to timestamps happens only at presentation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NS_PER_US = 1_000
NS_PER_MS = 1_000_000
NS_PER_SECOND = 1_000_000_000
NS_PER_MINUTE = 60 * NS_PER_SECOND
NS_PER_HOUR = 60 * NS_PER_MINUTE
NS_PER_DAY = 24 * NS_PER_HOUR


def ns_floor_div(col: Column, divisor: int) -> Column:
    """Exact floor-division of a ns-long column (positive epochs).

    NEVER divide ns epochs with `/`: ~1.7e18 exceeds double's 2^53, so
    the float path can misplace values within ~256 ns of a boundary
    (reference bug B3's failure class). Decimal division is exact;
    decimal→long cast truncates, which is floor for positive epochs.
    """
    return (col.cast("decimal(38,0)") / F.lit(divisor)).cast("long")


def ns_to_timestamp(col: Column) -> Column:
    """ns-long → µs TimestampType (truncating, presentation only)."""
    return F.timestamp_micros(ns_floor_div(col, NS_PER_US))


def ns_bucket(col: Column, width_ns: int) -> Column:
    """Epoch-aligned tumbling bucket start (ns long). Matches DuckDB
    time_bucket(INTERVAL ...) for positive epochs. Pure long arithmetic
    (subtract-modulo) — exact at any epoch magnitude."""
    return (col - col % F.lit(width_ns)).cast("long")
