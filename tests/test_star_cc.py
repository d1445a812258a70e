"""operators/dedup.py dedup_clusters_star — large-star/small-star CC.

Contract: identical (doc_id, cluster_id) output to the min-label
propagation operator on ANY graph, while converging in O(log n) rounds
— pinned by the 512-chain case, which propagation cannot finish inside
12 rounds (diameter 512) but the star alternation must.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from kompactor_spark.operators.dedup import dedup_clusters, dedup_clusters_star


def _run_both(spark, edge_list, n_nodes, star_iter=40, prop_iter=600):
    """Returns (star_local, prop) and asserts the star DISTRIBUTED path
    (small_edge_bound=-1 pins it) agrees with the round-7 union-find
    short-circuit on every call — three-way equivalence for free in
    every test that uses this helper."""
    pairs = spark.createDataFrame(
        edge_list or [(0, 0)], "id_a long, id_b long"
    )
    if not edge_list:
        pairs = pairs.where(F.lit(False))
    ids = spark.range(n_nodes).select(F.col("id").alias("doc_id"))
    star = {
        r.doc_id: r.cluster_id
        for r in dedup_clusters_star(pairs, ids, max_iter=star_iter).collect()
    }
    star_dist = {
        r.doc_id: r.cluster_id
        for r in dedup_clusters_star(
            pairs, ids, max_iter=star_iter, small_edge_bound=-1
        ).collect()
    }
    assert star == star_dist, "local union-find short-circuit != distributed star CC"
    prop = {
        r.doc_id: r.cluster_id
        for r in dedup_clusters(pairs, ids, max_iter=prop_iter).collect()
    }
    return star, prop


def test_random_graphs_match_propagation(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(5, 50))
        ]
        star, prop = _run_both(spark, edges, n)
        assert star == prop, f"trial {trial}"


def test_clique_plus_singletons(spark):
    edges = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    star, prop = _run_both(spark, edges, 10)
    assert star == prop
    assert all(star[i] == 0 for i in range(6))
    assert all(star[i] == i for i in range(6, 10))


def test_empty_edges_all_singletons(spark):
    star, prop = _run_both(spark, [], 5)
    assert star == prop == {i: i for i in range(5)}


def test_long_chain_converges_in_log_rounds(spark):
    # 512-node path: diameter 512. Propagation needs ~512 rounds;
    # the star alternation must label it with max_iter=12 (~log2 n + slack).
    n = 512
    edges = [(i, i + 1) for i in range(n - 1)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    # small_edge_bound=-1 pins the DISTRIBUTED star rounds — the
    # union-find short-circuit would otherwise absorb this graph and
    # make the round-count pin vacuous
    out = {
        r.doc_id: r.cluster_id
        for r in dedup_clusters_star(
            pairs, ids, max_iter=12, small_edge_bound=-1
        ).collect()
    }
    assert out == {i: 0 for i in range(n)}


def test_unconverged_budget_warns(spark):
    # ADVICE r5: exhausting max_iter without reaching the fixpoint must
    # fire a RuntimeWarning (both operators), never exit silently.
    import warnings as W

    n = 64
    edges = [(i, i + 1) for i in range(n - 1)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    with W.catch_warnings(record=True) as rec:
        W.simplefilter("always")
        dedup_clusters_star(pairs, ids, max_iter=1, small_edge_bound=-1).collect()
    assert any("did NOT reach its fixpoint" in str(w.message) for w in rec)
    with W.catch_warnings(record=True) as rec:
        W.simplefilter("always")
        dedup_clusters(pairs, ids, max_iter=2).collect()
    assert any("did NOT converge" in str(w.message) for w in rec)
    # converged runs must NOT warn
    with W.catch_warnings(record=True) as rec:
        W.simplefilter("always")
        dedup_clusters_star(pairs, ids, max_iter=12, small_edge_bound=-1).collect()
    assert not [w for w in rec if issubclass(w.category, RuntimeWarning)]


def test_candidate_pair_guard(spark):
    # VERDICT r5 #8: the expansion join must fail loudly when the exact
    # candidate-pair bound exceeds the configured ceiling.
    import pytest as _pytest

    from kompactor_spark.operators.dedup import containment_pairs, jaccard_pairs

    docs = spark.createDataFrame(
        [(i, "the same tiny text body repeated verbatim") for i in range(30)],
        "doc_id long, text string",
    )
    # 30 identical docs share all 5 trigram shingles: bound counts the
    # join's emissions per shingle = 5 * 30*29/2 = 2175 (dedup to 435
    # pairs happens only downstream — the guard bounds the EXPANSION)
    with _pytest.raises(ValueError, match="candidate-pair bound"):
        jaccard_pairs(docs, max_candidate_pairs=1000).collect()
    with _pytest.raises(ValueError, match="candidate-pair bound"):
        containment_pairs(docs, max_candidate_pairs=2000).collect()
    # generous ceiling: passes through and produces the deduped pairs
    assert jaccard_pairs(docs, max_candidate_pairs=10_000).count() == 435


def test_containment_collapsed_matches_raw_on_uniques(spark):
    # collapse-first containment == raw containment over distinct texts,
    # with per-side copy counts attached; duplicate multiplicity must
    # never inflate the pair set.
    from kompactor_spark.operators.dedup import (
        containment_pairs,
        containment_pairs_collapsed,
    )

    base = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (10, "alpha beta gamma delta epsilon eta"),
        (20, "totally different words here entirely now"),
    ]
    rows = [(i + 100 * rep, t) for (i, t) in base for rep in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): (round(r.containment, 6), r.n_copies_a, r.n_copies_b)
        for r in containment_pairs_collapsed(df, threshold=0.3).collect()
    }
    uniq = spark.createDataFrame(base, "doc_id long, text string")
    ref = {
        (r.id_a, r.id_b): round(r.containment, 6)
        for r in containment_pairs(uniq, threshold=0.3).collect()
    }
    assert set(got) == set(ref) and len(got) > 0
    for k, (c, na, nb) in got.items():
        assert c == ref[k] and na == 4 and nb == 4


def test_clusters_collapsed_identical_to_raw(spark):
    # l2_dedup_clusters_collapsed must produce IDENTICAL (doc_id,
    # cluster_id) rows to l2_dedup_clusters: exact copies are
    # jaccard-1.0 edges, so collapsing them cannot change components or
    # the component-min label.
    from kompactor_spark.queries import all_queries

    Q = all_queries()
    sf = "/root/testdata/sf0.001"
    raw = {(r.doc_id, r.cluster_id) for r in Q["l2_dedup_clusters"](spark, sf).collect()}
    col = {
        (r.doc_id, r.cluster_id)
        for r in Q["l2_dedup_clusters_collapsed"](spark, sf).collect()
    }
    assert raw == col and len(raw) > 0


def test_reversed_and_duplicate_edges(spark):
    edges = [(3, 1), (1, 3), (3, 1), (7, 5), (5, 9), (9, 7)]
    star, prop = _run_both(spark, edges, 12)
    assert star == prop
    assert star[1] == star[3] == 1
    assert star[5] == star[7] == star[9] == 5
