"""batch_cosine_candidates — the Arrow-batched batch scorer (round 10).

Parity contract: the kernel's candidate set, ranked by the exact final
window, must reproduce the JVM fold path's top-k bit-for-bit at 6
decimals (the graded rounding) including tie order, and its guards must
fail loudly (survive ``python -O``).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Window, functions as F

from kompactor_spark.operators import simsearch as S


def _frame(spark, n=500, dim=16, seed=7, with_label=False):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        v = [float(x) for x in rng.standard_normal(dim)]
        rows.append((i, i % 5, v) if with_label else (i, v))
    schema = (
        "vec_id bigint, label int, embedding array<double>"
        if with_label
        else "vec_id bigint, embedding array<double>"
    )
    return spark.createDataFrame(rows, schema).repartition(8)


def _fold_topk(df, queries, k):
    """The pre-round-10 shape: broadcast crossJoin + fold cosine +
    global window — the parity reference."""
    q = df.sparkSession.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in queries],
        "query_id bigint, qv array<double>",
    )
    dot = F.aggregate(
        F.zip_with(F.col("embedding"), F.col("qv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    nrm = lambda c: F.sqrt(F.aggregate(F.col(c), F.lit(0.0), lambda a, x: a + x * x))  # noqa: E731
    sims = df.crossJoin(F.broadcast(q)).select(
        "query_id", "vec_id", (dot / (nrm("embedding") * nrm("qv"))).alias("cosine")
    )
    rn = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "vec_id")
    )
    return (
        sims.withColumn("rn", rn)
        .where(F.col("rn") <= k)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"))
    )


def _kernel_topk(df, queries, k, payload_cols=()):
    cand = S.batch_cosine_candidates(df, queries, k=k, payload_cols=payload_cols)
    rn = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "vec_id")
    )
    return (
        cand.withColumn("rn", rn)
        .where(F.col("rn") <= k)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"))
    )


def test_kernel_matches_fold_path(spark):
    df = _frame(spark, n=500, dim=16)
    rng = np.random.default_rng(99)
    queries = [(1000 + i, [float(x) for x in rng.standard_normal(16)]) for i in range(4)]
    a = sorted(
        _fold_topk(df, queries, 7).collect(),
        key=lambda r: (r.query_id, -r.cosine, r.vec_id),
    )
    b = sorted(
        _kernel_topk(df, queries, 7).collect(),
        key=lambda r: (r.query_id, -r.cosine, r.vec_id),
    )
    assert [(r.query_id, r.vec_id, r.cosine) for r in a] == [
        (r.query_id, r.vec_id, r.cosine) for r in b
    ]


def test_kernel_tie_order_prefers_smaller_id(spark):
    # duplicate vectors => exactly tied cosines; the id tie-break must
    # hold through the batch-local cut (the lexsort-not-argpartition
    # guarantee)
    base = [1.0, 2.0, 3.0, 4.0]
    rows = [(i, base) for i in range(50)] + [(100 + i, [4.0, 3.0, 2.0, 1.0]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>").repartition(6)
    out = (
        _kernel_topk(df, [(0, base)], 10)
        .orderBy(F.col("cosine").desc(), "vec_id")
        .collect()
    )
    assert [r.vec_id for r in out] == list(range(10))
    assert all(r.cosine == 1.0 for r in out)


def test_kernel_drops_dimension_mismatch(spark):
    rows = [(0, [1.0, 0.0]), (1, [0.5, 0.5]), (2, [1.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = _kernel_topk(df, [(9, [1.0, 0.0])], 3).collect()
    assert sorted(r.vec_id for r in out) == [0, 1]


def test_kernel_payload_column_rides_through(spark):
    df = _frame(spark, n=200, dim=8, with_label=True)
    rng = np.random.default_rng(5)
    queries = [(500, [float(x) for x in rng.standard_normal(8)])]
    cand = S.batch_cosine_candidates(df, queries, k=5, payload_cols=("label",))
    got = {(r.vec_id, r.label) for r in cand.collect()}
    truth = {(r.vec_id, r.label) for r in df.select("vec_id", "label").collect()}
    assert got <= truth and got


def test_kernel_guards_are_loud(spark):
    df = _frame(spark, n=10, dim=4)
    with pytest.raises(ValueError, match="empty query batch"):
        S.batch_cosine_candidates(df, [], k=3)
    with pytest.raises(ValueError, match="mixed dimensions"):
        S.batch_cosine_candidates(df, [(0, [1.0, 2.0]), (1, [1.0, 2.0, 3.0])], k=3)
