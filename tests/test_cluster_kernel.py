"""assign_strict_kernel — the round-11 strict-left-association
assignment kernel (operators/cluster.py).

Contract: BIT-IDENTICAL cluster assignments to the interpreted JVM fold
(`assign_literal`) — the fold's left association over dimensions is the
cross-engine bit-exactness contract that makes the iterative k-means
family hash-gradeable, so the kernel must reproduce it exactly,
including exact ties, not merely approximate it.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from kompactor_spark.operators import cluster as C

SF = "/root/testdata/sf0.001"


def _emb(spark):
    from kompactor_spark.tables import load_table

    return load_table(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


def _clusters(df):
    return {r.vec_id: r.cluster for r in df.select("vec_id", "cluster").collect()}


def test_kernel_matches_fold_on_testdata_both_iterations(spark):
    """Full 2-iteration Lloyd parity on real embeddings: iteration-1
    assignments bit-match, therefore the exact quantized centroids
    match, therefore iteration-2 assignments bit-match."""
    emb = _emb(spark)
    seeds = C.seed_centroids(emb, k=8)
    a1_fold = C.assign_literal(emb, seeds)
    a1_kern = C.assign_strict_kernel(emb, seeds)
    assert _clusters(a1_kern) == _clusters(a1_fold)
    c1_fold = C._collect_centroids(C.exact_mean_centroids(a1_fold))
    c1_kern = C._collect_centroids(C.exact_mean_centroids(a1_kern))
    # centroids byte-identical (floats compared exactly)
    assert c1_kern == c1_fold
    assert _clusters(C.assign_strict_kernel(emb, c1_kern)) == _clusters(
        C.assign_literal(emb, c1_fold)
    )


def test_kernel_exact_tie_breaks_to_lower_cid(spark):
    # v is EXACTLY equidistant (d2 = 1.0, an exact double) from both
    # centroids; the fold's struct ordering and the kernel's
    # first-minimum argmin must both pick the LOWER cid — even when the
    # lower cid is listed later in the input
    cents = [(7, [1.0, 0.0]), (3, [-1.0, 0.0])]
    rows = [(0, [0.0, 0.0]), (1, [0.25, 0.0]), (2, [-0.25, 0.0])]
    df = spark.createDataFrame(rows, "vec_id bigint, v array<double>")
    fold = _clusters(C.assign_literal(df, cents))
    kern = _clusters(C.assign_strict_kernel(df, cents))
    assert kern == fold
    assert kern[0] == 3  # exact tie -> lower cid
    assert kern[1] == 7 and kern[2] == 3


def test_kernel_association_is_fold_order_not_pairwise(spark):
    # a fixture where pairwise summation would differ from strict left
    # association: alternating huge/tiny components make the partial
    # sums catastrophically cancel in an order-dependent way. The
    # kernel must agree with the fold bit-for-bit on the ARGMIN even
    # here. dim 32 (beyond _UNROLL_MAX_DIM, the fold path's regime).
    rng = np.random.default_rng(17)
    base = []
    for i in range(32):
        base.append(1e16 if i % 2 == 0 else -1e16 + float(i))
    cents = [
        (0, [x + float(rng.integers(0, 3)) for x in base]),
        (1, [x - float(rng.integers(0, 3)) for x in base]),
    ]
    rows = [
        (int(i), [x + float(rng.standard_normal()) for x in base]) for i in range(64)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, v array<double>").repartition(4)
    assert _clusters(C.assign_strict_kernel(df, cents)) == _clusters(
        C.assign_literal(df, cents)
    )


def test_kernel_guards_are_loud(spark):
    good = [(0, [1.0, 2.0])]
    df_null = spark.createDataFrame(good + [(1, None)], "vec_id bigint, v array<double>")
    with pytest.raises(Exception, match="NULL or dimension-mismatched"):
        C.assign_strict_kernel(df_null, [(0, [0.0, 0.0])]).collect()
    df_dim = spark.createDataFrame(good + [(1, [1.0, 2.0, 3.0])], "vec_id bigint, v array<double>")
    with pytest.raises(Exception, match="dimension-mismatched"):
        C.assign_strict_kernel(df_dim, [(0, [0.0, 0.0])]).collect()
    with pytest.raises(ValueError, match="mixed dimensions"):
        C.assign_strict_kernel(df_dim, [(0, [0.0]), (1, [0.0, 0.0])])


def test_kernel_plan_is_arrow_not_row_udf(spark):
    emb = _emb(spark)
    p = (
        C.assign_strict_kernel(emb, C.seed_centroids(emb, k=8))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in p
    assert "BatchEvalPython" not in p
