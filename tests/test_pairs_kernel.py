"""Fused one-task pair kernel (dedup._pairs_kernel) parity vs the
distributed inverted-index pipeline — the same bit-equality discipline
as the quantile fast-path kernels: every value the kernel emits must be
byte-identical to the distributed plan's, on real testdata and on
adversarial shapes (short docs, empty text, duplicate texts, hot
shingles, chunked pair counting)."""

from __future__ import annotations

import struct

import pytest

from kompactor_spark.operators import dedup as D

SF = "/root/testdata/sf0.001"


def _canon(df, metric):
    return sorted(
        (r.id_a, r.id_b, struct.pack("<d", r[metric]).hex())
        for r in df.collect()
    )


def _both(spark, docs, metric, **kw):
    fn = D.containment_pairs if metric == "containment" else D.jaccard_pairs
    kernel = _canon(fn(docs, **kw), metric)
    old = D._FUSED_PAIRS_MAX_REPS
    try:
        D._FUSED_PAIRS_MAX_REPS = -1
        dist = _canon(fn(docs, **kw), metric)
    finally:
        D._FUSED_PAIRS_MAX_REPS = old
    return kernel, dist


@pytest.mark.parametrize("metric", ["jaccard", "containment"])
def test_kernel_parity_on_testdata(spark, metric):
    from kompactor_spark.tables import load_table

    docs = load_table(spark, SF, "documents")
    k, d = _both(spark, docs, metric, threshold=0.12)
    assert k == d and len(k) > 0


@pytest.mark.parametrize("metric", ["jaccard", "containment"])
def test_kernel_parity_adversarial_shapes(spark, metric):
    rows = [
        (1, "a b c d e f g"),
        (2, "a b c d e f g"),          # exact duplicate of 1
        (3, "a b c d e x y"),          # near-dup of 1/2
        (4, "zz"),                      # fewer tokens than n -> whole-text shingle
        (5, "zz"),                      # duplicate short doc (jaccard 1.0)
        (6, ""),                        # empty text -> [""] single shingle
        (7, "q r"),                     # 2 tokens < n
        (8, "completely different words here entirely"),
        (9, "a b c d e f g h i j k l"),  # superset-ish of 1 (containment asymmetry)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    k, d = _both(spark, docs, metric, threshold=0.05)
    assert k == d and len(k) > 0


@pytest.mark.parametrize("metric", ["jaccard", "containment"])
def test_kernel_parity_hot_shingle_interplay(spark, metric):
    # "alpha beta gamma" head is hot at max_shingle_freq=5 (30 docs);
    # the u/v pairs stay under it — the kernel's doc-frequency filter
    # must drop exactly what the distributed anti-join drops
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta u{i // 2} v{i // 2} w{i // 2}") for i in range(30)],
        "doc_id long, text string",
    )
    k, d = _both(spark, docs, metric, threshold=0.1, max_shingle_freq=5)
    assert k == d and len(k) > 0


def test_kernel_chunked_pair_counting_identical(spark):
    # force tiny chunks so every frequency class splits across many
    # numpy chunks and the unique+bincount merge path is exercised
    docs = spark.createDataFrame(
        [(i, f"shared tokens every doc u{i % 7} v{i % 5} w{i % 3} x{i}") for i in range(60)],
        "doc_id long, text string",
    )
    whole = _canon(D.jaccard_pairs(docs, threshold=0.05, max_shingle_freq=50), "jaccard")
    old = D._KERNEL_PAIR_CHUNK
    try:
        D._KERNEL_PAIR_CHUNK = 4  # pathological: ~1 row per chunk
        chunked = _canon(D.jaccard_pairs(docs, threshold=0.05, max_shingle_freq=50), "jaccard")
    finally:
        D._KERNEL_PAIR_CHUNK = old
    assert whole == chunked and len(whole) > 0


def test_ceiling_always_takes_guarded_distributed_path(spark):
    # max_candidate_pairs set -> the classic guard + distributed plan
    # runs even on kernel-sized inputs, preserving the loud ValueError
    docs = spark.createDataFrame(
        [(i, "the same tiny text body repeated verbatim") for i in range(30)],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="candidate-pair bound"):
        D.jaccard_pairs(docs, max_candidate_pairs=1000).collect()
    # and with a generous ceiling the distributed result still matches
    # the kernel's (no-ceiling) result
    g = _canon(D.jaccard_pairs(docs, max_candidate_pairs=10_000), "jaccard")
    k = _canon(D.jaccard_pairs(docs), "jaccard")
    assert g == k and len(k) == 435


def test_kernel_single_stage_plan(spark):
    # the point of the kernel: a model-sized corpus's pair plan is one
    # MapInPandas over a coalesced scan — no joins, no aggregates
    docs = spark.createDataFrame(
        [(i, f"u{i // 2} v{i // 2} w{i // 2} x{i // 2} y{i}") for i in range(20)],
        "doc_id long, text string",
    )
    df = D.jaccard_pairs(docs, threshold=0.1)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in p
    assert "Join" not in p and "HashAggregate" not in p
