"""Differential tests: every registered query with an oracle must match
DuckDB at sf0.001 (same mechanism the driver uses at sf0.01)."""

from __future__ import annotations

import pytest

from kompactor_spark.oracle import run_compare
from kompactor_spark.queries import all_oracles, all_queries

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, sf_dir, name):
    res = run_compare(spark, sf_dir, name, QUERIES[name], ORACLES[name])
    assert res.ok, f"{name}: {res.notes}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_no_oracle_runs(spark, sf_dir, name):
    """Queries without a SQL oracle still must run and return rows."""
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
