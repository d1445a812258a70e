"""Distributed k-means (Lloyd refinement) and cluster-blocked semantic
dedup over embedding columns.

Scale shape (the 100 TB story)
------------------------------
Assignment is a pure narrow projection: the k x d centroid model is
embedded as literals (the standard broadcast-model Lloyd step — MLlib's
KMeans does the same collect-k-centroids-per-iteration), so each scan
partition assigns its rows independently with ZERO shuffle.  The only
shuffles are the centroid recomputation (posexplode -> groupBy
(cluster, dim), map-side partial agg: shuffle volume is k*d partial
sums per task, independent of row count) and the final per-cluster
count.  Driver state is O(k*d) doubles — model, not data.

Cross-engine determinism
------------------------
Centroid means of IEEE doubles are summation-order-dependent, so a
naive float mean cannot hash-match a DuckDB oracle bit-for-bit.  Each
component is therefore quantized to an exact integer count of 2^-40
units — ``round(x * 2^40)`` is bit-identical in Spark and DuckDB (both
round half away from zero, and x * 2^40 is an exact double product for
float32 inputs) — summed exactly as two long limbs
(fixedpoint.limb_split discipline: safe past 2^23 rows per cluster on
one limb, unbounded with the split), and divided back out in a fixed
order.  Both engines then see bit-identical centroids, so iteration-2
assignment (argmin over macroscopically separated distances) agrees.

Semantic dedup (SemDeDup, Abbas et al. 2023, arXiv:2303.09540) prunes
near-duplicate PAIRS inside each k-means cell only — the cell is the
blocking key, turning an O(n^2) corpus self-join into per-cell joins.
Cross-cell pairs are deliberately out of scope (that approximation IS
the published algorithm); at 100 TB the cell id becomes the partition
key and each cell's pair join is independent work.

Reference parity: kompactor.ts has no clustering surface; this is part
of the driver-mandated LLM-pipeline extension (dedup/similarity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kompactor_spark import fixedpoint as fx

#: Quantization scale for exact centroid sums: 2^40 units per 1.0.
SCALE_BITS = 40
SCALE = float(1 << SCALE_BITS)


def _dist2_to_literal(v, centroid: list[float]) -> F.Column:
    """Squared L2 distance from array column ``v`` to a literal centroid,
    folded in index order (deterministic given identical inputs)."""
    cv = F.array(*[F.lit(float(c)) for c in centroid])
    return F.aggregate(
        F.zip_with(v, cv, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_literal(emb: DataFrame, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """Add ``cluster`` = argmin_c dist(v, c) as a shuffle-free projection.

    ``emb`` needs columns (vec_id, v: array<double>).  Ties break on the
    smaller centroid id via struct ordering — deterministic.
    """
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    _dist2_to_literal(F.col("v"), cv).alias("d2"),
                    F.lit(int(cid)).alias("cid"),
                )
                for cid, cv in centroids
            ]
        )
    )
    return emb.withColumn("cluster", best["cid"])


def assign_strict_kernel(emb: DataFrame, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """Arrow-batched assignment, BIT-IDENTICAL to :func:`assign_literal`
    (round 11 — the strict-left-association kernel VERDICT r10 named as
    the fix if the fold's cost ever mattered; it was the dominant cost
    of l7_kmeans_refine/l7_cluster_purity at sf10: 8 centroids x 64
    interpreted lambda steps per row, twice).

    Why the result is bit-exact, not merely close: the JVM fold
    evaluates, per (row, centroid), ``(((0 + t0) + t1) + t2)...`` with
    ``t_i = (v_i - c_i) * (v_i - c_i)``.  The kernel loops over
    DIMENSIONS in Python and accumulates element-wise
    (``acc += diff * diff`` on an n x k float64 matrix), so every
    (row, centroid) cell sees the same left-associated IEEE-754
    operation sequence on the same doubles — no pairwise reduction
    anywhere.  Ties then break to the smaller centroid id exactly like
    the fold path's struct ordering: ``np.argmin`` returns the FIRST
    minimum and the centroid axis is sorted by cid.  Parity is asserted
    bit-for-bit (including planted exact ties) in
    tests/test_cluster_kernel.py.

    Preconditions (loud, same discipline as batch_cosine_candidates):
    no NULL vectors, every vector exactly the centroid dimension.
    """
    cents = sorted((int(cid), [float(x) for x in cv]) for cid, cv in centroids)
    cids = [cid for cid, _ in cents]
    cmat = [cv for _, cv in cents]
    dims = {len(cv) for cv in cmat}
    if len(dims) != 1:
        raise ValueError(f"centroids have mixed dimensions: {sorted(dims)}")
    (dim,) = dims
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in emb.schema.fields)
    out_schema = f"{fields}, cluster int"

    def run(batches):
        import numpy as np

        C = np.asarray(cmat, dtype=np.float64)  # k x d
        cid_arr = np.asarray(cids, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = pdf["v"].to_numpy()
            for v in vecs:
                if v is None or len(v) != dim:
                    raise ValueError(
                        "assign_strict_kernel: NULL or dimension-mismatched "
                        f"vector (expected dim {dim}) — clean embeddings upstream"
                    )
            V = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
            n = len(pdf)
            acc = np.zeros((n, len(cids)), dtype=np.float64)
            # dimension loop = the fold's left association, vectorized
            # across (row, centroid) cells — NOT a pairwise matmul
            for i in range(dim):
                diff = V[:, i][:, None] - C[:, i][None, :]
                acc += diff * diff
            best = cid_arr[np.argmin(acc, axis=1)]  # first min = lowest cid
            out = pdf.copy()
            out["cluster"] = best.astype("int32")
            yield out

    return emb.mapInPandas(run, out_schema)


def exact_mean_centroids(assigned: DataFrame) -> DataFrame:
    """Per-cluster elementwise mean, exact: quantize -> limb-sum longs ->
    recombine in DECIMAL(38) -> one double division chain.

    Input needs (cluster, v: array<double>); returns
    (cluster, pos, cd) with ``cd`` bit-identical to DuckDB's
    ``CAST(SUM(CAST(round(x*2^40) AS BIGINT)) AS DOUBLE)/2^40/n``.
    """
    flat = assigned.select("cluster", F.posexplode("v").alias("pos", "x"))
    q = F.round(F.col("x") * F.lit(SCALE)).cast("long")
    hi, lo = fx.limb_split(q)
    agg = flat.select("cluster", "pos", hi.alias("hi"), lo.alias("lo")).groupBy(
        "cluster", "pos"
    ).agg(F.sum("hi").alias("shi"), F.sum("lo").alias("slo"), F.count(F.lit(1)).alias("n"))
    total = (
        F.col("shi").cast("decimal(38,0)") * F.lit(fx.LIMB).cast("decimal(7,0)")
        + F.col("slo").cast("decimal(38,0)")
    ).cast("double")
    return agg.select(
        "cluster", "pos", (total / F.lit(SCALE) / F.col("n").cast("double")).alias("cd")
    )


def _collect_centroids(cent_long: DataFrame) -> list[tuple[int, list[float]]]:
    """(cluster, pos, cd) rows -> [(cid, [c0..cd-1]), ...].  O(k*d) model
    state — the broadcast-model step of Lloyd's, not a data collect."""
    rows = cent_long.collect()
    byc: dict[int, dict[int, float]] = {}
    for r in rows:
        byc.setdefault(r["cluster"], {})[r["pos"]] = r["cd"]
    return [
        (cid, [comps[p] for p in sorted(comps)]) for cid, comps in sorted(byc.items())
    ]


def seed_centroids(emb: DataFrame, k: int) -> list[tuple[int, list[float]]]:
    """Deterministic seeds: the k lowest vec_ids, verbatim (a public
    k-means deterministic-init convention for reproducible pipelines)."""
    rows = emb.where(F.col("vec_id") < k).select("vec_id", "v").collect()
    return [(int(r["vec_id"]), [float(x) for x in r["v"]]) for r in sorted(rows)]


def kmeans_refine(emb: DataFrame, k: int = 8, iters: int = 2) -> DataFrame:
    """``iters`` Lloyd iterations from deterministic seeds; returns the
    final assignment (vec_id, v, cluster)."""
    cents = seed_centroids(emb, k)
    assigned = assign_strict_kernel(emb, cents)
    for _ in range(iters - 1):
        cents = _collect_centroids(exact_mean_centroids(assigned))
        assigned = assign_strict_kernel(emb, cents)
    return assigned


def semantic_dedup_pairs(emb: DataFrame, k: int = 8, threshold: float = 0.25) -> DataFrame:
    """SemDeDup: cosine-similar pairs inside each k-means cell.

    Returns (id_a, id_b, cluster_id, cosine) with id_a < id_b.  The
    self-join key is (cluster) — per-cell quadratic, never corpus-wide.
    """
    assigned = kmeans_refine(emb, k=k, iters=2).select(
        F.col("vec_id"), F.col("v"), F.col("cluster")
    )
    a = assigned.alias("a")
    b = assigned.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda side: F.sqrt(  # noqa: E731
        F.aggregate(F.col(f"{side}.v"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    cos = dot / (nrm("a") * nrm("b"))
    return (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.col("a.cluster").alias("cluster_id"),
            cos.alias("cos_raw"),
        )
        .where(F.col("cos_raw") >= threshold)
    )


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011, "Product Quantization for
# Nearest Neighbor Search"): split each vector into n_sub subspaces,
# k-means each subspace independently, store one code per subspace.
# Here: one exact-quantized Lloyd refinement from deterministic seeds
# (subvectors of vec_id < k), same bit-reproducibility discipline as
# kmeans_refine.  Scale shape: the codebook is n_sub*k*(d/n_sub) doubles
# (KBs — broadcast), training shuffles only codebook-sized partial sums,
# and encoding is a broadcast join + per-(vec, sub) argmin — linear in
# corpus size with no corpus-wide shuffle wider than (vec, sub, code).
# ---------------------------------------------------------------------------


def _subspace_rows(emb: DataFrame, n_sub: int, sub_dim: int) -> DataFrame:
    """(vec_id, v) -> (vec_id, sub, sv): one row per subspace slice."""
    slices = F.array(
        *[
            F.struct(
                F.lit(s).alias("sub"),
                F.slice("v", s * sub_dim + 1, sub_dim).alias("sv"),
            )
            for s in range(n_sub)
        ]
    )
    return emb.select("vec_id", F.inline(slices))


def _pq_assign(subs: DataFrame, cb: DataFrame, sub_dim: int) -> DataFrame:
    """Argmin code per (vec_id, sub) against codebook (sub, code, cv);
    ties break on the smaller code.  Keeps sv for downstream training.

    Round 9: the argmin is a min-struct AGGREGATE, not a row_number
    window — lexicographic min over (d2, code) picks the identical
    winner, but the hash agg partial-combines the k candidate rows
    map-side (k× shuffle reduction) and never sorts, where the window
    shuffled and sorted the full |vecs|·n_sub·k candidate expansion
    (25.6M rows per assignment pass at sf10, twice per training).
    sv is constant within a (vec_id, sub) group, so carrying it
    through ``first`` is deterministic.

    The squared distance is an UNROLLED left-associated chain of
    element_at terms, not F.aggregate(zip_with(...)): higher-order
    functions evaluate their lambda interpreted per element (decomposed
    round 9: ~40 s of the 86 s sf10 training was the fold over the
    |vecs|·n_sub·k candidate expansion), while the unrolled chain stays
    inside whole-stage codegen. The fold's seed 0.0 + t1 == t1 for the
    non-negative squares, so the chain is bit-identical to the fold.
    sub_dim comes from the caller — deriving it with first() on the
    codebook frame would execute the codebook's whole training subtree
    as an extra job. Wide subspaces keep the fold: the unroll's
    crossover is ~16 terms (simsearch._UNROLL_MAX_DIM — a 64-term
    chain measured 4x SLOWER than the fold)."""
    from kompactor_spark.operators.simsearch import _UNROLL_MAX_DIM

    if sub_dim > _UNROLL_MAX_DIM:
        d2 = F.aggregate(
            F.zip_with("sv", "cv", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    else:
        d2 = None
        for i in range(1, sub_dim + 1):
            diff = F.element_at("sv", i) - F.element_at("cv", i)
            term = diff * diff
            d2 = term if d2 is None else d2 + term
    return (
        subs.join(F.broadcast(cb), "sub")
        .select("vec_id", "sub", "sv", "code", d2.alias("d2"))
        .groupBy("vec_id", "sub")
        .agg(
            F.min(F.struct("d2", "code")).alias("__b"),
            F.first("sv").alias("sv"),
        )
        .select("vec_id", "sub", "sv", F.col("__b.code").alias("code"))
    )


def pq_codebook(emb: DataFrame, n_sub: int = 8, k: int = 16):
    """Train a PQ codebook (1 exact Lloyd refinement) and encode.

    Returns (assignments, centroid_means): assignments = (vec_id, sub,
    code) after refinement; centroid_means = (sub, code, pos, cd) long
    format with ``cd`` exact-quantized (bit-identical cross-engine).
    """
    sub_dim = len(emb.select("v").first()[0]) // n_sub
    subs = _subspace_rows(emb, n_sub, sub_dim)
    c0 = subs.where(F.col("vec_id") < k).select(
        "sub", F.col("vec_id").alias("code"), F.col("sv").alias("cv")
    )
    # a1 is consumed by multiple downstream subtrees; it is deliberately
    # NOT checkpointed — an A/B in this round measured the block-store
    # write of the 1.6M array rows costing MORE than recomputing the
    # (now codegen-cheap) candidate expansion per consumer, and the
    # recompute is immune to the ambient store regime (the same
    # trade the a22 histogram decomposition documented, SCALE.md §7d)
    a1 = _pq_assign(subs, c0, sub_dim)
    flat = a1.select("sub", "code", F.posexplode("sv").alias("pos", "x"))
    q = F.round(F.col("x") * F.lit(SCALE)).cast("long")
    hi, lo = fx.limb_split(q)
    m1 = (
        flat.select("sub", "code", "pos", hi.alias("hi"), lo.alias("lo"))
        .groupBy("sub", "code", "pos")
        .agg(F.sum("hi").alias("shi"), F.sum("lo").alias("slo"), F.count(F.lit(1)).alias("n"))
        .select(
            "sub",
            "code",
            "pos",
            (
                (
                    F.col("shi").cast("decimal(38,0)") * F.lit(fx.LIMB).cast("decimal(7,0)")
                    + F.col("slo").cast("decimal(38,0)")
                ).cast("double")
                / F.lit(SCALE)
                / F.col("n").cast("double")
            ).alias("cd"),
        )
    )
    c1 = m1.groupBy("sub", "code").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cd"))), lambda s: s["cd"]
        ).alias("cv")
    )
    a2 = _pq_assign(subs, c1, sub_dim).select("vec_id", "sub", "code")
    return a2, m1
