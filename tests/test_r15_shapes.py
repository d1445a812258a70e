"""Round-15 optimization pins: single-scan m11 and the surprisal
window-total fold.

m11_basket_lift: supports and the global order count derive from the
baskets frame, so the executed (adaptive) plan reads lineitem ONCE and
reuses the collect_set exchange for all three consumers (before: three
scans, 10 jobs; after: one scan, 8 jobs — scripts/r15_m11_ab2_out.json
and plans/r15/m11_basket_lift_{before,after}_executed.txt).

l4_surprisal: the corpus total rides the tf broadcast as a
single-partition window sum instead of a separate 1-row aggregate +
BroadcastNestedLoopJoin over every token row (before: 11 jobs; after:
10 — plans/r15/l4_surprisal_{before,after}_executed.txt).
"""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from kompactor_spark.queries import all_queries
from kompactor_spark.session import ensure_conf

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = SparkSession.builder.master("local[4]").appName("r15-shape-pins").getOrCreate()
    ensure_conf(s)
    yield s


@pytest.fixture(scope="module")
def Q():
    return all_queries()


def executed_final(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString().split("Initial Plan")[0]


def test_m11_single_lineitem_scan(spark, Q):
    """All three m11 consumers (pair kernel, supports, order count)
    share ONE materialized collect_set exchange at runtime — the fact
    table is scanned once, not three times."""
    p = executed_final(Q["m11_basket_lift"](spark, SF))
    assert p.count("Scan parquet") == 1
    assert p.count("ReusedExchange") >= 2  # supports + count consumers


def test_m11_supports_from_baskets_source(spark):
    """The supports/count sides must keep deriving from the baskets
    frame (no lineitem re-scan, no countDistinct expansion)."""
    import inspect

    from kompactor_spark.queries import relational_ext as R

    src = inspect.getsource(R.m11_basket_lift)
    assert "F.countDistinct" not in src  # the old re-scan shape's call
    assert 'F.explode("us")' in src
    assert 'F.size("us") >= 0' in src  # tautological reuse-preserving filter


@pytest.mark.parametrize(
    "name",
    ["l2_containment_collapsed", "l2_jaccard_pairs", "l2_jaccard_collapsed"],
)
def test_pairs_kernel_arrow_boundary(spark, Q, name):
    """The fused pair kernel crosses the Python boundary as Arrow on
    BOTH sides (round 15: mapInPandas -> mapInArrow, 2.17 -> 1.14 s on
    the graded containment row; scripts/r15_pairs_boundary_ab_out.json).
    Guard: the kernel rows must never silently fall back to the pandas
    wrapper."""
    p = df_plan = Q[name](spark, SF)
    p = df_plan._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in p, name
    assert "MapInPandas" not in p, name


def test_surprisal_no_total_crossjoin(spark, Q):
    """The corpus total is folded into the tf broadcast (window sum) —
    no 1-row BroadcastNestedLoopJoin pass over the token rows, corpus
    still tokenized exactly once."""
    df = Q["l4_surprisal"](spark, SF)
    p = executed_final(df)
    assert "BroadcastNestedLoopJoin" not in p
    assert p.count("Generate explode") == 1
    assert p.count("Scan parquet") == 1
    assert "ReusedExchange" in p  # the dt exchange reuse still holds
