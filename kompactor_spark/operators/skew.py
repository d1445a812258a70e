"""Skew mitigation operators (SURVEY §7 M6: "skewed keys → salting or
AQE skew-join").

At 100 TB a single hot key (one user, one null-ish default, one
celebrity document) concentrates a shuffle partition onto one executor
and the stage runs at the speed of that straggler. AQE's skew-join
splitting handles the join case at runtime; these operators handle it
structurally, and also cover the aggregation case AQE does not split:

- ``salted_agg``: two-phase aggregation — partial agg on
  (key, salt) spreads the hot key over ``buckets`` reducers, final agg
  on key recombines. Exact for algebraic aggregates (sum/count/min/max).
- ``salted_broadcast_dim_join``: explode a small dim ``buckets``×, salt
  the fact side deterministically, join on (key, salt) — every fact
  partition finds its dim row locally, no fact shuffle, hot keys spread.

Both are deterministic (salt = xxhash64 of a unique row key, mod
buckets) so results are exactly equal to the unsalted plan — which is
how the oracle checks them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SALT = "__salt"


def skew_report(df: DataFrame, key: str, top_n: int = 20, dp: int = 6) -> DataFrame:
    """Top-``top_n`` hottest values of ``key`` with share and cumulative
    share of all rows — the diagnostic that decides whether a key needs
    the salting operators below. Shared by the ``m10_skew_report``
    registered query and the CLI ``--skew-report`` handler (single
    source of truth; they differ only in rounding ``dp``).

    Scale shape: the heavy lifting is one count-by-key aggregate plus a
    distributed top-k (TakeOrderedAndProject — per-task heaps + one
    ``top_n``-row merge). The ranking/cumulative windows run over the
    ``top_n``-row slice only, never over |distinct keys| rows.
    """
    c = df.groupBy(key).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = c.agg(F.sum("n").cast("double").alias("t"))
    top = c.orderBy(F.col("n").desc(), key).limit(top_n)
    r = top.withColumn("rk", F.row_number().over(Window.orderBy(F.col("n").desc(), key)))
    cum = Window.orderBy("rk").rowsBetween(Window.unboundedPreceding, 0)
    return (
        r.crossJoin(F.broadcast(tot))
        .select(
            key,
            "n",
            F.round(F.col("n") / F.col("t"), dp).alias("share"),
            F.round(F.sum("n").over(cum) / F.col("t"), dp).alias("cum_share"),
            "rk",
        )
        .orderBy("rk")
        .drop("rk")
    )


def with_salt(df: DataFrame, unique_cols: list[str], buckets: int) -> DataFrame:
    """Deterministic salt in [0, buckets): hash of the row's unique key.
    Deterministic (vs F.rand) so retried/speculated tasks salt
    identically and results are reproducible."""
    return df.withColumn(SALT, F.pmod(F.xxhash64(*unique_cols), F.lit(buckets)).cast("int"))


def explode_salts(dim: DataFrame, buckets: int) -> DataFrame:
    """Replicate each dim row once per salt value (dim is small —
    buckets× a broadcastable table stays broadcastable)."""
    return dim.withColumn(SALT, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))).withColumn(
        SALT, F.col(SALT).cast("int")
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    unique_cols: list[str],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation for algebraic measures.

    ``aggs`` maps output name -> aggregate over the INPUT (phase 1);
    phase 2 re-aggregates partials: sum→sum, count→sum, min→min,
    max→max. Callers pass phase-1 expressions; phase 2 is derived from
    the expression's function name, so only algebraic aggregates are
    accepted (avg must be decomposed by the caller into sum+count).
    """
    import re

    phase1 = with_salt(df, unique_cols, buckets).groupBy(*keys, SALT).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    refold = []
    for n, c in aggs.items():
        fn = re.match(r"(\w+)\(", c._jc.toString() or "")
        fname = fn.group(1).lower() if fn else "sum"
        if fname in ("count", "sum"):
            refold.append(F.sum(n).alias(n))
        elif fname == "min":
            refold.append(F.min(n).alias(n))
        elif fname == "max":
            refold.append(F.max(n).alias(n))
        else:
            raise ValueError(f"non-algebraic aggregate for salted_agg: {fname}")
    return phase1.groupBy(*keys).agg(*refold)


def salted_broadcast_dim_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    fact_unique: list[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a (possibly skewed) fact to a small dim with the dim
    exploded across salt buckets and broadcast. The fact side is never
    shuffled; hot fact keys spread over ``buckets`` probe streams."""
    f = with_salt(fact, fact_unique, buckets)
    d = explode_salts(dim, buckets)
    cond = (F.col(f"f.{fact_key}") == F.col(f"d.{dim_key}")) & (F.col(f"f.{SALT}") == F.col(f"d.{SALT}"))
    out = f.alias("f").join(F.broadcast(d.alias("d")), cond, how)
    drop = [F.col(f"f.{SALT}"), F.col(f"d.{SALT}")]
    return out.drop(*drop)
