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


def test_ceiling_keeps_kernel_path_with_driver_guard(spark):
    # VERDICT r7 #4: max_candidate_pairs set on a kernel-sized input
    # now computes the bound DRIVER-side (from the kernel's own
    # shingling) and keeps the one-task fast path — same loud
    # ValueError, no PythonException, no 8-stage distributed detour
    docs = spark.createDataFrame(
        [(i, "the same tiny text body repeated verbatim") for i in range(30)],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="candidate-pair bound"):
        D.jaccard_pairs(docs, max_candidate_pairs=1000)
    # with a generous ceiling the guarded call STILL plans the kernel...
    g_df = D.jaccard_pairs(docs, max_candidate_pairs=10_000)
    p = g_df._jdf.queryExecution().executedPlan().toString()
    assert ("MapInPandas" in p or "MapInArrow" in p) and "Join" not in p
    # ...and matches both the unguarded kernel and the guarded
    # distributed path bit-for-bit
    g = _canon(g_df, "jaccard")
    k = _canon(D.jaccard_pairs(docs), "jaccard")
    old = D._FUSED_PAIRS_MAX_REPS
    try:
        D._FUSED_PAIRS_MAX_REPS = -1
        dist = _canon(D.jaccard_pairs(docs, max_candidate_pairs=10_000), "jaccard")
    finally:
        D._FUSED_PAIRS_MAX_REPS = old
    assert g == k == dist and len(k) == 435


@pytest.mark.parametrize("directed", [False, True])
def test_kernel_bound_equals_distributed_bound(spark, directed):
    # the driver-side guard counts EXACTLY the pairs the distributed
    # _candidate_pair_bound counts over the hot-filtered index
    rows = [(i, f"alpha beta gamma delta u{i // 3} v{i // 3} w{i}") for i in range(24)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for freq in (5, 1000):
        inv = D._inverted_index(docs, "doc_id", "text", 3, freq)[1]
        dist_bound = D._candidate_pair_bound(inv, directed)
        texts = [t for _, t in rows]
        kern_bound = D._kernel_pair_bound(texts, 3, freq, directed)
        assert kern_bound == dist_bound > 0


def test_duplicate_ids_route_distributed(spark):
    # unique non-NULL ids are a kernel precondition (ADVICE r7): the
    # dispatch must reject duplicate-id inputs so semantics never
    # silently switch (the distributed join excludes equal-id pairs
    # and merges duplicate ids in its sizes aggregate)
    dup = spark.createDataFrame(
        [(1, "a b c d e"), (1, "a b c d f"), (2, "a b c d e")],
        "doc_id long, text string",
    )
    assert not D._pairs_small_input(dup, "doc_id", "text")
    p = D.jaccard_pairs(dup, threshold=0.1)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in p  # distributed path planned
    uniq = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f"), (3, "a b c d e")],
        "doc_id long, text string",
    )
    assert D._pairs_small_input(uniq, "doc_id", "text")


def test_kernel_single_stage_plan(spark):
    # the point of the kernel: a model-sized corpus's pair plan is one
    # MapInPandas over a coalesced scan — no joins, no aggregates
    docs = spark.createDataFrame(
        [(i, f"u{i // 2} v{i // 2} w{i // 2} x{i // 2} y{i}") for i in range(20)],
        "doc_id long, text string",
    )
    df = D.jaccard_pairs(docs, threshold=0.1)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in p or "MapInArrow" in p
    assert "Join" not in p and "HashAggregate" not in p


@pytest.mark.parametrize("metric", ["jaccard", "containment"])
def test_collapsed_kernel_parity_and_single_task(spark, metric):
    # Round 8: the collapse-first operators run the whole verify —
    # pairs AND both multiplicity columns — in one fused task. Must be
    # bit-identical to the composed path (distributed pairs + two
    # multiplicity joins) on a duplicate-heavy corpus, and the fused
    # plan must contain no Join.
    fn = (
        D.containment_pairs_collapsed
        if metric == "containment"
        else D.jaccard_pairs_collapsed
    )
    rows = []
    for i in range(120):
        base = i % 10  # 10 distinct texts, multiplicities 12 each
        rows.append((i, f"alpha beta gamma u{base} v{base} w{base} x{base % 3}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def canon(df):
        return sorted(
            (
                r.id_a,
                r.id_b,
                struct.pack("<d", r[metric]).hex(),
                r.n_copies_a,
                r.n_copies_b,
            )
            for r in df.collect()
        )

    fused_df = fn(docs, threshold=0.1)
    p = fused_df._jdf.queryExecution().executedPlan().toString()
    assert ("MapInPandas" in p or "MapInArrow" in p) and "Join" not in p
    fused = canon(fused_df)
    old = D._FUSED_PAIRS_MAX_REPS
    try:
        D._FUSED_PAIRS_MAX_REPS = -1
        composed = canon(fn(docs, threshold=0.1))
    finally:
        D._FUSED_PAIRS_MAX_REPS = old
    assert fused == composed and len(fused) > 0
    assert all(r[3] == 12 and r[4] == 12 for r in fused)  # copy counts carried


def test_collapsed_kernel_guard(spark):
    # ceiling honored on the fused collapsed path: driver-side
    # ValueError, and a generous ceiling still fuses
    docs = spark.createDataFrame(
        [(i, f"one two three four shared{i % 5}") for i in range(200)],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="candidate-pair bound"):
        D.jaccard_pairs_collapsed(docs, max_candidate_pairs=1)
    ok = D.jaccard_pairs_collapsed(docs, max_candidate_pairs=100_000)
    p = ok._jdf.queryExecution().executedPlan().toString()
    assert ("MapInPandas" in p or "MapInArrow" in p) and "Join" not in p
    assert ok.count() > 0


@pytest.mark.parametrize("metric", ["jaccard", "containment"])
def test_collapsed_kernel_empty_input(spark, metric):
    # empty corpus -> empty 5-column frame with the right schema on the
    # fused path (the kernel's no-batches early return)
    fn = (
        D.containment_pairs_collapsed
        if metric == "containment"
        else D.jaccard_pairs_collapsed
    )
    empty = spark.createDataFrame([], "doc_id long, text string")
    out = fn(empty)
    assert out.columns == ["id_a", "id_b", metric, "n_copies_a", "n_copies_b"]
    assert out.count() == 0


# ---------------------------------------------------------------------------
# Hypothesis-randomized parity (round-8 continuation): the kernel was
# rewritten twice this round (zip-shingling + single-pass postings,
# int32 pair keys), so the fixed adversarial fixtures above are
# reinforced with seeded random corpora — small vocab forces shared
# shingles, mixed doc lengths cross the n-token boundary, and random
# (n, threshold, max_shingle_freq) sweep the dispatch-visible surface.
# derandomize=True: the examples are a fixed regression corpus, not CI
# noise.
# ---------------------------------------------------------------------------
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@st.composite
def corpus_st(draw):
    vocab = [f"w{i}" for i in range(draw(st.integers(4, 12)))]
    ndocs = draw(st.integers(2, 24))
    docs = []
    for i in range(ndocs):
        length = draw(st.integers(0, 9))
        toks = [vocab[draw(st.integers(0, len(vocab) - 1))] for _ in range(length)]
        docs.append((i, " ".join(toks)))
    n = draw(st.integers(2, 4))
    threshold = draw(st.sampled_from([0.05, 0.3, 0.7, 1.0]))
    max_freq = draw(st.sampled_from([2, 5, 1000]))
    metric = draw(st.sampled_from(["jaccard", "containment"]))
    return docs, n, threshold, max_freq, metric


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(case=corpus_st())
def test_kernel_parity_property(spark, case):
    docs_rows, n, threshold, max_freq, metric = case
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    k, d = _both(
        spark, docs, metric, n=n, threshold=threshold, max_shingle_freq=max_freq
    )
    assert k == d


# --------------------------------------------------------------------------
# G1 pair-expansion kernel (queries/graph._pair_count_kernel) property
# check: for ANY bucket composition and ANY flush budget (including
# budgets that force the row-blocked oversized-bucket path and
# mid-batch partial flushes), the summed pair counts must equal the
# brute-force combinations count. Round 12: the flush budget and the
# pair-count bound replaced the unenforceable user-count bound
# (ADVICE r11), so the budget-invariance IS the exactness contract.
# --------------------------------------------------------------------------
@st.composite
def buckets_st(draw):
    n_buckets = draw(st.integers(min_value=1, max_value=8))
    buckets = [
        draw(
            st.lists(
                st.integers(min_value=0, max_value=40),
                min_size=0,
                max_size=30,
                unique=True,
            )
        )
        for _ in range(n_buckets)
    ]
    flush = draw(st.sampled_from([1, 7, 50, 4_000_000]))
    return buckets, flush


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(case=buckets_st())
def test_g1_pair_kernel_flush_invariance_property(spark, case):
    from collections import Counter
    from itertools import combinations

    from kompactor_spark.queries import graph as G

    buckets, flush = case
    expected = Counter()
    for us in buckets:
        for u, v in combinations(sorted(us), 2):
            expected[(u, v)] += 1
    df = spark.createDataFrame([(b,) for b in buckets], "us array<bigint>").coalesce(1)
    old = G._G1_FLUSH_PAIRS
    G._G1_FLUSH_PAIRS = flush
    try:
        got = {(r.u, r.v): r.w for r in G._pair_count_kernel(df, 1).collect()}
    finally:
        G._G1_FLUSH_PAIRS = old
    assert got == dict(expected)
