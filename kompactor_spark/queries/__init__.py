"""Declared query surface (SURVEY §2.B) — the duckdb-oracle contract.

Every operator the engine claims is registered here twice:
- a Spark callable ``(spark, sf_dir) -> DataFrame``
- (when SQL-expressible) the equivalent ANSI SQL string for the DuckDB
  oracle, with IDENTICAL output column names and pinned types.

Determinism discipline (SURVEY §2.B): total ORDER BY with unique
tiebreaks; money sums via DECIMAL casts then presented as DOUBLE;
other doubles rounded 6 dp; explicit NULLS FIRST/LAST; timestamps
canonicalized as strings; events.ts compared as epoch-ns longs.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}
# check-class annotations for rows that are BY DESIGN not hash-checked
# against a DuckDB oracle (T = tolerance-tested, PY = python-golden,
# B = batch/stream equivalence, P = plan property). The driver records
# `no_oracle` for these; this metadata documents that the grade is
# intentional, not broken — see tests/test_registry.py.
_CHECK_NOTES: dict[str, str] = {}

_SUBMODULES = [
    "kompactor_spark.queries.relational",
    "kompactor_spark.queries.sources_sinks",
    "kompactor_spark.queries.window_sort",
    "kompactor_spark.queries.scalar_functions",
    "kompactor_spark.queries.streaming_batch",
    "kompactor_spark.queries.udf",
    "kompactor_spark.queries.llm_pipeline",
    "kompactor_spark.queries.compaction_queries",
    "kompactor_spark.queries.scale_ops",
    "kompactor_spark.queries.relational_ext",
    "kompactor_spark.queries.tpch",
    "kompactor_spark.queries.timeseries",
    "kompactor_spark.queries.maintenance",
    "kompactor_spark.queries.graph",
]
_loaded = False


def register(name: str, oracle: str | None = None, check: str | None = None):
    """Decorator: add a query (and optionally its DuckDB oracle SQL).

    ``check`` annotates oracle-less rows with WHY they carry no SQL twin
    (e.g. "T: ±5% tolerance vs exact — sketches can never hash-match");
    surfaced via :func:`check_notes` so every future correctness
    artifact self-documents its intentional non-H rows."""

    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        if check is not None:
            _CHECK_NOTES[name] = check
        return fn

    return deco


def _load() -> None:
    global _loaded
    if not _loaded:
        for mod in _SUBMODULES:
            importlib.import_module(mod)
        _loaded = True


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load()
    return dict(_ORACLES)


def check_notes() -> dict[str, str]:
    """Why each intentionally-oracle-less row has no DuckDB twin."""
    _load()
    return dict(_CHECK_NOTES)
