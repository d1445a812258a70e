"""Property tests for operators/cluster.py (k-means refine + SemDeDup)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kompactor_spark.operators import cluster as C
from kompactor_spark.tables import loader


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return (
        loader(sf_dir, spark)("embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .cache()
    )


def _dist2(v, c):
    return sum((a - b) ** 2 for a, b in zip(v, c))


def test_assignment_is_argmin(emb):
    cents = C.seed_centroids(emb, k=8)
    rows = C.assign_literal(emb, cents).collect()
    assert rows, "empty assignment"
    for r in rows[:50]:
        d = {cid: _dist2(r["v"], cv) for cid, cv in cents}
        best = min(d, key=lambda cid: (d[cid], cid))
        assert r["cluster"] == best, f"vec {r['vec_id']}: {r['cluster']} != {best}"


def test_every_vector_assigned_exactly_once(emb):
    n = emb.count()
    assigned = C.kmeans_refine(emb, k=8, iters=2)
    assert assigned.count() == n
    assert assigned.select("vec_id").distinct().count() == n
    assert assigned.select("cluster").distinct().count() <= 8


def test_exact_mean_centroids_match_python_quantized_mean(emb):
    cents = C.seed_centroids(emb, k=8)
    a1 = C.assign_literal(emb, cents)
    got = {
        (r["cluster"], r["pos"]): r["cd"]
        for r in C.exact_mean_centroids(a1).collect()
    }
    # Python re-derivation of the exact quantized mean, integer math only
    # until the final fixed-order double division chain.
    byc: dict[int, list[list[float]]] = {}
    for r in a1.collect():
        byc.setdefault(r["cluster"], []).append(r["v"])
    scale = float(1 << C.SCALE_BITS)
    for cid, vecs in byc.items():
        for pos in range(len(vecs[0])):
            total = sum(
                int(math.floor(x * scale + 0.5)) if x >= 0 else -int(math.floor(-x * scale + 0.5))
                for x in (v[pos] for v in vecs)
            )
            expect = float(total) / scale / float(len(vecs))
            assert got[(cid, pos)] == expect, (cid, pos)


def test_refinement_reduces_total_within_cluster_ss(emb):
    cents0 = C.seed_centroids(emb, k=8)
    a1 = C.assign_literal(emb, cents0)
    c1 = C._collect_centroids(C.exact_mean_centroids(a1))
    a2 = C.assign_literal(emb, c1)

    def sse(assigned, cents):
        cmap = dict(cents)
        return sum(_dist2(r["v"], cmap[r["cluster"]]) for r in assigned.collect())

    # Lloyd's monotonicity: SSE(assign vs OWN centroids) never increases
    # after a recompute+reassign step.
    assert sse(a2, c1) <= sse(a1, dict(cents0).items()) + 1e-9


def test_semantic_dedup_pairs_are_cell_blocked_and_thresholded(emb):
    pairs = C.semantic_dedup_pairs(emb, k=8, threshold=0.25)
    rows = pairs.collect()
    assert rows, "expected some semantic-dup pairs at tau=0.25"
    assigned = {r["vec_id"]: r["cluster"] for r in C.kmeans_refine(emb, 8, 2).collect()}
    vmap = {r["vec_id"]: r["v"] for r in emb.collect()}
    for r in rows[:100]:
        assert r["id_a"] < r["id_b"]
        assert assigned[r["id_a"]] == assigned[r["id_b"]] == r["cluster_id"]
        va, vb = vmap[r["id_a"]], vmap[r["id_b"]]
        cos = sum(a * b for a, b in zip(va, vb)) / (
            math.sqrt(sum(a * a for a in va)) * math.sqrt(sum(b * b for b in vb))
        )
        assert cos >= 0.25 - 1e-9
        assert abs(cos - r["cos_raw"]) < 1e-9


def test_char_entropy_bounds(spark, sf_dir):
    from kompactor_spark.queries.llm_pipeline import l4_char_entropy

    rows = l4_char_entropy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_distinct_chars"] >= 1
        # 0 <= H <= ln(alphabet size)
        assert -1e-9 <= r["char_entropy"] <= math.log(r["n_distinct_chars"]) + 1e-9


def test_pq_codebook_codes_complete_and_refined(emb):
    a2, m1 = C.pq_codebook(emb, n_sub=8, k=16)
    rows = a2.collect()
    n = emb.count()
    # exactly one code per (vec, subspace); codes in range
    assert len(rows) == n * 8
    assert len({(r["vec_id"], r["sub"]) for r in rows}) == n * 8
    assert all(0 <= r["code"] < 16 and 0 <= r["sub"] < 8 for r in rows)

    # Lloyd monotonicity, per subspace: total quantization SSE with the
    # refined codebook <= SSE with the seed codebook.
    vecs = {r["vec_id"]: r["v"] for r in emb.collect()}
    cb1: dict = {}
    for r in m1.collect():
        cb1.setdefault((r["sub"], r["code"]), {})[r["pos"]] = r["cd"]
    cb1 = {k: [d[p] for p in sorted(d)] for k, d in cb1.items()}
    seeds = {
        (s, vid): vecs[vid][s * 8 : s * 8 + 8] for s in range(8) for vid in range(16)
    }

    def sse(codebook):
        tot = 0.0
        for vid, v in vecs.items():
            for s in range(8):
                sv = v[s * 8 : s * 8 + 8]
                tot += min(
                    sum((a - b) ** 2 for a, b in zip(sv, cv))
                    for (s2, _), cv in codebook.items()
                    if s2 == s
                )
        return tot

    seed_cb = {(s, c): seeds[(s, c)] for s in range(8) for c in range(16)}
    assert sse(cb1) <= sse(seed_cb) + 1e-9
