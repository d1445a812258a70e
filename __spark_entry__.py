"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``kompactor_spark/`` — this module is the thin
adapter over the engine's query registry (kompactor_spark.queries).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kompactor_spark.queries import all_oracles, all_queries  # noqa: E402
from kompactor_spark.session import ensure_conf  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the 5-table star join + revenue rollup (J9)."""
    ensure_conf(spark)
    return all_queries()["j9_star_join"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.B."""
    regs = all_queries()

    def bind(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_conf(spark)  # nanosAsLong etc. on the driver's session
            return fn(spark, sf_dir)

        return wrapped

    return {name: bind(fn) for name, fn in regs.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checked query."""
    return all_oracles()
