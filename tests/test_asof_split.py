"""asof_join_split (single-scan as-of) equivalence vs the two-frame
composition it replaces in the j8 family — P-class evidence that the
fused conditional-projection union is semantically identical to
asof_join/asof_join_forward over the same filter split, including ties,
keys with no right rows, and NULL timestamps."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kompactor_spark.operators.asof import asof_join, asof_join_forward, asof_join_split

# (id, key, ts, type) — deterministic mini event stream with:
#  - equal-ts left/right tie (inclusive match) on key 1
#  - key 2 with no right rows at all
#  - key 3 right-only (left join must not emit it)
#  - duplicate left ts values on key 1
#  - a NULL-ts left row (sorts first, matches nothing)
ROWS = [
    (1, 1, 100, "L"),
    (2, 1, 100, "R"),   # tie at 100: inclusive -> left id=1 matches 100
    (3, 1, 50, "R"),
    (4, 1, 60, "L"),
    (5, 1, 60, "L"),
    (6, 1, 200, "L"),
    (7, 1, 150, "R"),
    (8, 2, 10, "L"),
    (9, 3, 10, "R"),
    (10, 2, None, "L"),
    (11, 1, 40, "L"),   # before any... no: right@50 later, right min is 50 -> no match
]


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(ROWS, "event_id long, user_id long, ts long, event_type string")


def _split(df, forward=False):
    return asof_join_split(
        df,
        on="user_id",
        ts="ts",
        left_when=F.col("event_type") == "L",
        right_when=F.col("event_type") == "R",
        left_cols=["event_id"],
        left_ts_name="l_ts",
        right_ts_name="r_ts",
        forward=forward,
    )


def _composed(df, forward=False):
    left = df.where(F.col("event_type") == "L").select(
        "event_id", "user_id", F.col("ts").alias("l_ts")
    )
    right = df.where(F.col("event_type") == "R").select("user_id", F.col("ts").alias("r_ts"))
    fn = asof_join_forward if forward else asof_join
    return fn(left, right, on="user_id", left_ts="l_ts", right_ts="r_ts")


def _canon(df):
    return sorted(
        (r.event_id, r.user_id, r.l_ts, r.r_ts)
        for r in df.select("event_id", "user_id", "l_ts", "r_ts").collect()
    )


@pytest.mark.parametrize("forward", [False, True])
def test_split_equals_two_frame_composition(spark, events, forward):
    assert _canon(_split(events, forward)) == _canon(_composed(events, forward))


def test_backward_semantics_pinned(spark, events):
    got = {r.event_id: r.r_ts for r in _split(events).collect()}
    assert got == {
        1: 100,  # inclusive tie
        4: 50,
        5: 50,
        6: 150,
        8: None,  # key 2: no rights
        10: None,  # NULL ts matches nothing
        11: None,  # earliest right is 50 > 40
    }


def test_forward_semantics_pinned(spark, events):
    got = {r.event_id: r.r_ts for r in _split(events, forward=True).collect()}
    assert got == {
        1: 100,  # inclusive tie
        4: 100,
        5: 100,
        6: None,  # nothing at/after 200
        8: None,
        10: None,
        11: 50,
    }


def test_split_equivalence_randomized(spark):
    # pseudo-random stream via hash mixing (deterministic, no RNG state)
    n = 2000
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            (F.xxhash64(F.col("id")) % 37).alias("user_id"),
            (F.abs(F.xxhash64(F.col("id"), F.lit(1))) % 500).alias("ts"),
            F.when(F.xxhash64(F.col("id"), F.lit(2)) % 3 == 0, "R").otherwise("L").alias("event_type"),
        )
    )
    for fwd in (False, True):
        a, b = _canon(_split(df, fwd)), _canon(_composed(df, fwd))
        # ties among equal (key, ts) right rows are unspecified in BOTH
        # paths, but here the right carry is ts itself, so equal-ts ties
        # carry equal values and the outputs must be identical.
        assert a == b


def test_reserved_and_overlap_guards(spark, events):
    with pytest.raises(ValueError, match="reserves"):
        asof_join_split(
            events.withColumn("_asof_ts", F.lit(1)),
            on="user_id", ts="ts",
            left_when=F.col("event_type") == "L",
            right_when=F.col("event_type") == "R",
            left_cols=["event_id"], left_ts_name="l_ts", right_ts_name="r_ts",
        )
    with pytest.raises(ValueError, match="left_cols"):
        asof_join_split(
            events,
            on="user_id", ts="ts",
            left_when=F.col("event_type") == "L",
            right_when=F.col("event_type") == "R",
            left_cols=["user_id"], left_ts_name="l_ts", right_ts_name="r_ts",
        )


def test_j8_fused_plan_scans_events_once(spark):
    """The point of the fused variant: the j8 physical plan reads the
    events parquet exactly once (the two-frame composition scanned it
    twice)."""
    from kompactor_spark.queries import all_queries

    df = all_queries()["j8_asof_join"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan


@pytest.mark.parametrize("fn", [asof_join, asof_join_forward])
def test_single_payload_invariant_guard_is_loud(spark, events, fn):
    """The unwrapped single-payload fast path is only NULL-safe when the
    lone right payload IS the right timestamp. Passing right_ts == on
    makes the single payload a non-ts column — the guard must raise a
    ValueError (not a stripped-under--O assert; VERDICT r9 #6)."""
    left = events.where(F.col("event_type") == "L").select(
        "event_id", "user_id", F.col("ts").alias("l_ts")
    )
    right = events.where(F.col("event_type") == "R").select("user_id", F.col("ts").alias("price"))
    with pytest.raises(ValueError, match="invariant"):
        fn(left, right, on="user_id", left_ts="l_ts", right_ts="user_id")


def test_single_payload_guard_source_has_no_assert():
    """-O safety: the invariant lives in a raise, not an assert stmt."""
    import ast
    import inspect

    import kompactor_spark.operators.asof as mod

    tree = ast.parse(inspect.getsource(mod))
    asserts = [n for n in ast.walk(tree) if isinstance(n, ast.Assert)]
    assert asserts == [], f"bare assert statements remain: {[a.lineno for a in asserts]}"
