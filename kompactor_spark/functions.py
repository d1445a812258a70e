"""ClickHouse-compatible scalar function surface (reference R5).

The reference installs DuckDB's community ``chsql`` extension —
ClickHouse-compat macros — at startup (kompactor.ts:154-157) but never
invokes it; the load signals the intended user-facing function surface
for InfluxDB-style time-series data. This module implements that
surface Spark-first: every helper is a pure ``Column`` expression
(JVM-side, whole-stage-codegen-eligible) over the engine's ns-long
time policy — no UDFs, no Python in the hot path.

Naming follows ClickHouse (camelCase); inputs named ``ts_ns`` are
int64 nanoseconds since epoch (the engine's native time type, SURVEY
§1.2). All ns arithmetic goes through ``timeutil`` (exact subtract-
modulo / decimal division — reference bug B3's failure class is floats
on ns epochs, banned here).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from kompactor_spark.timeutil import (
    NS_PER_DAY,
    NS_PER_HOUR,
    NS_PER_MINUTE,
    NS_PER_SECOND,
    ns_bucket,
    ns_floor_div,
    ns_to_timestamp,
)


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# -- fixed-width bucket functions: exact long arithmetic, no calendar --


def toStartOfSecond(ts_ns: Column | str) -> Column:
    return ns_bucket(_col(ts_ns), NS_PER_SECOND)


def toStartOfMinute(ts_ns: Column | str) -> Column:
    return ns_bucket(_col(ts_ns), NS_PER_MINUTE)


def toStartOfHour(ts_ns: Column | str) -> Column:
    return ns_bucket(_col(ts_ns), NS_PER_HOUR)


def toStartOfDay(ts_ns: Column | str) -> Column:
    return ns_bucket(_col(ts_ns), NS_PER_DAY)


def toStartOfInterval(ts_ns: Column | str, interval_ns: int) -> Column:
    """Generic fixed-width bucket (ClickHouse toStartOfInterval)."""
    return ns_bucket(_col(ts_ns), int(interval_ns))


# -- calendar functions: ns → µs timestamp, then Spark built-ins.
#    µs truncation matches DuckDB's Parquet ns→µs read, so calendar
#    parts agree cross-engine. --


def toDate(ts_ns: Column | str) -> Column:
    return F.to_date(ns_to_timestamp(_col(ts_ns)))


def toYear(ts_ns: Column | str) -> Column:
    return F.year(ns_to_timestamp(_col(ts_ns)))


def toMonth(ts_ns: Column | str) -> Column:
    return F.month(ns_to_timestamp(_col(ts_ns)))


def toDayOfMonth(ts_ns: Column | str) -> Column:
    return F.dayofmonth(ns_to_timestamp(_col(ts_ns)))


def toHour(ts_ns: Column | str) -> Column:
    return F.hour(ns_to_timestamp(_col(ts_ns)))


def toYYYYMM(ts_ns: Column | str) -> Column:
    t = ns_to_timestamp(_col(ts_ns))
    return (F.year(t) * F.lit(100) + F.month(t)).cast("int")


def toYYYYMMDD(ts_ns: Column | str) -> Column:
    t = ns_to_timestamp(_col(ts_ns))
    return (
        F.year(t) * F.lit(10000) + F.month(t) * F.lit(100) + F.dayofmonth(t)
    ).cast("int")


def toUnixTimestamp(ts_ns: Column | str) -> Column:
    """ns-long → whole seconds since epoch (floor)."""
    return ns_floor_div(_col(ts_ns), NS_PER_SECOND)


def formatDateTime(ts_ns: Column | str, fmt: str) -> Column:
    """ClickHouse formatDateTime, with Spark's datetime pattern syntax."""
    return F.date_format(ns_to_timestamp(_col(ts_ns)), fmt)


# -- conditionals / misc (ClickHouse names over Spark builtins) --


def multiIf(*args) -> Column:
    """multiIf(c1, v1, c2, v2, ..., default) — chained CASE WHEN."""
    if len(args) < 3 or len(args) % 2 == 0:
        raise ValueError("multiIf needs cond/value pairs plus a default")
    out = None
    for i in range(0, len(args) - 1, 2):
        cond, val = args[i], args[i + 1]
        out = F.when(cond, val) if out is None else out.when(cond, val)
    return out.otherwise(args[-1])


def ifNull(c: Column | str, default) -> Column:
    return F.coalesce(_col(c), F.lit(default))


def intDiv(a: Column | str, b: int) -> Column:
    """Exact integer division on longs (never the float `/` path)."""
    return ns_floor_div(_col(a).cast("long"), int(b))


def intDivOrZero(a: Column | str, b: int) -> Column:
    """intDiv that yields 0 instead of failing on b == 0."""
    if int(b) == 0:
        return F.lit(0).cast("long")
    return intDiv(a, b)


# -- strings (chsql string surface over Spark builtins) --


def empty(c: Column | str) -> Column:
    return F.length(_col(c)) == 0


def notEmpty(c: Column | str) -> Column:
    return F.length(_col(c)) > 0


def lcase(c: Column | str) -> Column:
    return F.lower(_col(c))


def ucase(c: Column | str) -> Column:
    return F.upper(_col(c))


def leftPad(c: Column | str, length: int, pad: str = " ") -> Column:
    return F.lpad(_col(c), length, pad)


def rightPad(c: Column | str, length: int, pad: str = " ") -> Column:
    return F.rpad(_col(c), length, pad)


def match(c: Column | str, pattern: str) -> Column:
    """ClickHouse match(haystack, re2_pattern) — regex containment."""
    return _col(c).rlike(pattern)


def splitByChar(sep: str, c: Column | str) -> Column:
    """ClickHouse argument order: separator first. Splits on the LITERAL
    character (escaped before hitting Spark's regex-based split)."""
    import re as _re

    return F.split(_col(c), _re.escape(sep))


def arrayJoin(c: Column | str) -> Column:
    """ClickHouse arrayJoin ≡ explode (one output row per element)."""
    return F.explode(_col(c))


# -- JSON extraction (chsql JSONExtract* over get_json_object) --


def JSONExtractString(c: Column | str, key: str) -> Column:
    return F.get_json_object(_col(c), f"$.{key}")


def JSONExtractInt(c: Column | str, key: str) -> Column:
    return F.get_json_object(_col(c), f"$.{key}").cast("long")


def JSONExtractFloat(c: Column | str, key: str) -> Column:
    return F.get_json_object(_col(c), f"$.{key}").cast("double")


# -- casts (chsql toX wrappers; saturating semantics NOT emulated —
#    out-of-range casts yield NULL per Spark ANSI-off, never wrap) --


def toString(c: Column | str) -> Column:
    return _col(c).cast("string")


def toInt32(c: Column | str) -> Column:
    return _col(c).cast("int")


def toInt64(c: Column | str) -> Column:
    return _col(c).cast("long")


def toFloat64(c: Column | str) -> Column:
    return _col(c).cast("double")


# -- IPv4 (chsql network helpers as pure integer/string expressions) --


def IPv4NumToString(c: Column | str) -> Column:
    v = _col(c).cast("long")
    return F.concat_ws(
        ".",
        F.shiftright(v, 24).bitwiseAND(F.lit(255)).cast("string"),
        F.shiftright(v, 16).bitwiseAND(F.lit(255)).cast("string"),
        F.shiftright(v, 8).bitwiseAND(F.lit(255)).cast("string"),
        v.bitwiseAND(F.lit(255)).cast("string"),
    )


def IPv4StringToNum(c: Column | str) -> Column:
    parts = F.split(_col(c), r"\.")
    return (
        parts.getItem(0).cast("long") * 16777216
        + parts.getItem(1).cast("long") * 65536
        + parts.getItem(2).cast("long") * 256
        + parts.getItem(3).cast("long")
    )
