"""Property tests for the round-4 operators (P-class evidence beyond the
DuckDB-oracle hash check): invariants that must hold on ANY testdata, so
a driver-side data regeneration can't silently break semantics."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kompactor_spark.queries import all_queries
from kompactor_spark.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def regs():
    return all_queries()


def test_surprisal_collision_guard_fires(spark):
    """Round 12: l4_surprisal keys its aggregates on xxhash64(token);
    a planted 64-bit collision (two rows sharing th with different
    32-bit guard lanes) must raise loudly inside the plan, and a clean
    frame must pass with exact counts."""
    import pytest as _pytest

    from kompactor_spark.queries.llm_pipeline import _collision_guarded_tf

    schema = "doc_id bigint, th bigint, cd double, mn int, mx int"
    clean = spark.createDataFrame(
        [(1, 10, 2.0, 7, 7), (2, 10, 3.0, 7, 7), (1, 11, 1.0, 9, 9)], schema
    )
    out = {r.th: r.c for r in _collision_guarded_tf(clean).collect()}
    assert out == {10: 5.0, 11: 1.0}

    planted = spark.createDataFrame(
        [(1, 10, 2.0, 7, 7), (2, 10, 3.0, 8, 8)], schema
    )
    with _pytest.raises(Exception, match="collision"):
        _collision_guarded_tf(planted).collect()


def test_surprisal_positive_and_token_weighted(spark, regs):
    rows = regs["l4_surprisal"](spark, SF).collect()
    docs = load_table(spark, SF, "documents").count()
    assert len(rows) == docs
    # every doc has >=1 token and p(token) < 1 => mean NLL > 0
    assert all(r.n_tokens >= 1 and r.surprisal > 0 for r in rows)


def test_incremental_dedup_subset_and_no_prior_overlap(spark, regs):
    from kompactor_spark.queries.llm_pipeline import _INCR_BATCH

    out = regs["l6_incremental_dedup"](spark, SF)
    docs = load_table(spark, SF, "documents")
    batch_ids = {r.doc_id for r in docs.where(F.col("source").isin(*_INCR_BATCH)).select("doc_id").collect()}
    kept = {r.doc_id for r in out.collect()}
    assert kept <= batch_ids
    # every kept doc's text is absent from the prior corpus
    prior_texts = {
        r.text for r in docs.where(~F.col("source").isin(*_INCR_BATCH)).select("text").collect()
    }
    kept_texts = {
        r.text
        for r in docs.where(F.col("doc_id").isin(*kept) if kept else F.lit(False)).select("text").collect()
    }
    assert not (kept_texts & prior_texts)


def test_contamination_score_bounds(spark, regs):
    rows = regs["l6_contamination_score"](spark, SF).collect()
    for r in rows:
        assert 0 <= r.n_hit <= r.n_shingles
        assert 0.0 <= r.contamination <= 1.0
        assert math.isclose(r.contamination, round(r.n_hit / r.n_shingles, 6), abs_tol=1e-9)


def test_chunk_documents_cover_and_stride(spark, regs):
    from kompactor_spark.queries.llm_pipeline import _CHUNK, _STRIDE

    out = regs["l6_chunk_documents"](spark, SF).collect()
    docs = {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, SF, "documents").where(F.col("doc_id") < 120).collect()
    }
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, chunks in by_doc.items():
        toks = docs[doc_id]
        chunks.sort(key=lambda r: r.chunk_id)
        # chunk_ids are dense from 0; every chunk matches the source slice
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            start = c.chunk_id * _STRIDE
            expect = toks[start : start + _CHUNK]
            assert c.chunk_text.split(" ") == expect
            assert c.n_tokens == len(expect)
        # coverage: the last chunk reaches the end of the document
        last = chunks[-1]
        assert last.chunk_id * _STRIDE + last.n_tokens == len(toks)


def test_sq8_quantize_error_bound(spark, regs):
    rows = regs["l3e_sq8_quantize"](spark, SF).collect()
    emb = load_table(spark, SF, "embeddings")
    n_vecs = emb.count()
    dims = len(emb.select("embedding").first()[0])
    assert len(rows) == n_vecs
    # per-dim scale s = max|x|/127 and |x - round(x/s)*s| <= s/2 <= max|x|/254;
    # with |x| <= 1-ish embeddings the RMSE must be far below one code step
    for r in rows:
        assert r.n_dims == dims
        assert 0.0 <= r.rmse < 0.01
        assert len(r.codes_head4_sorted.split(",")) == 4


def test_x18_zscore_threshold_and_floor(spark, regs):
    rows = regs["x18_rolling_zscore"](spark, SF).collect()
    for r in rows:
        assert abs(r.zscore) >= 3.0
        assert r.ts_ns % 1000 == 0  # µs-floored ns policy


def test_w11_funnel_consistency(spark, regs):
    row = regs["w11_funnel_conversion"](spark, SF).first()
    assert 0 <= row.n_converted_24h <= row.n_with_purchase_after <= row.n_signup_users
    if row.n_with_purchase_after:
        assert row.avg_hours_to_purchase >= 0.0


def test_containment_bounds_and_asymmetry(spark, regs):
    rows = regs["l2_containment_pairs"](spark, SF).collect()
    got = {(r.id_a, r.id_b): r.containment for r in rows}
    for (a, b), c in got.items():
        assert a != b
        assert 0.12 <= c <= 1.0
    # containment is directed: both directions may exist with different
    # values, and |A∩B|/|A| >= Jaccard for any pair — so every Jaccard
    # pair above the same threshold must appear (in at least one direction)
    jac = regs["l2_jaccard_pairs"](spark, SF).collect()
    for r in jac:
        if r.jaccard >= 0.12:
            assert (r.id_a, r.id_b) in got or (r.id_b, r.id_a) in got


def test_m4_stream_builder_batch_shape(spark):
    """Batch invocation of the streaming M4 builder matches x16 semantics."""
    from kompactor_spark.queries import all_queries
    from kompactor_spark.streaming.jobs import m4_downsample
    from kompactor_spark.tables import load_table

    ev = load_table(spark, SF, "events")
    got = {r.bucket_ns: r for r in m4_downsample(ev).collect()}
    want = {r.bucket_ns: r for r in all_queries()["x16_m4_downsample"](spark, SF).collect()}
    assert set(got) == set(want)
    for b, w in want.items():
        g = got[b]
        assert g.n == w.n and g.t_first == w.t_first and g.t_last == w.t_last
        assert math.isclose(g.v_first, float(w.v_first), rel_tol=1e-6)
        assert math.isclose(g.v_last, float(w.v_last), rel_tol=1e-6)


def test_x19_ewma_bounds_and_warmup(spark, regs):
    rows = regs["x19_ewma"](spark, SF).collect()
    ev = load_table(spark, SF, "events")
    assert len(rows) == ev.count()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    vmin, vmax = ev.agg(F.min("value"), F.max("value")).first()
    for rs in by_user.values():
        # ewma is a convex combination of observed values -> within range
        for r in rs:
            assert vmin - 1e-6 <= r.ewma <= vmax + 1e-6
        # first sample's renormalized EWMA equals the sample itself
        first = min(rs, key=lambda r: (r.ts_ns, r.event_id))
        v0 = (
            ev.where((F.col("user_id") == first.user_id))
            .orderBy(F.col("ts") - F.col("ts") % 1000, "event_id")
            .select("value")
            .first()[0]
        )
        assert math.isclose(first.ewma, round(v0, 6), abs_tol=1e-6)


def test_x20_cusum_invariants(spark, regs):
    rows = regs["x20_cusum"](spark, SF).collect()
    for r in rows:
        assert r.cusum_min <= r.cusum_max
        assert r.cusum_min - 1e-9 <= r.cusum_final <= r.cusum_max + 1e-9
        assert r.n >= 1


def test_x21_snapshots_monotone(spark, regs):
    rows = regs["x21_asof_snapshot"](spark, SF).collect()
    snaps = sorted({r.snap_ns for r in rows})
    assert len(snaps) == 3
    # later snapshots can only see MORE users, and each user's
    # last_ts advances monotonically across snapshots
    seen: dict = {}
    for s in snaps:
        users = {r.user_id: r.last_ts_ns for r in rows if r.snap_ns == s}
        for u, t in seen.items():
            assert u in users and users[u] >= t
        assert all(t <= s for t in users.values())
        seen = users


def test_zipf_slope_negative(spark, regs):
    row = regs["l4_zipf_slope"](spark, SF).first()
    # frequencies are non-increasing in rank => slope <= 0
    assert row.n_tokens > 10
    assert row.zipf_slope < 0


def test_knn_classify_vote_bounds(spark, regs):
    rows = regs["l7_knn_classify"](spark, SF).collect()
    emb = load_table(spark, SF, "embeddings")
    n_queries = emb.where(F.col("vec_id") < 8).count()
    labels = {r.label for r in emb.select("label").distinct().collect()}
    assert len(rows) == n_queries
    for r in rows:
        assert r.pred_label in labels
        # majority of k=10 -> at least ceil(10/len(labels)) votes
        assert 1 <= r.votes <= 10
        assert r.votes >= math.ceil(10 / max(len(labels), 1))


def test_dedup_rate_by_source_consistency(spark, regs):
    rows = regs["l6_dedup_rate_by_source"](spark, SF).collect()
    docs = load_table(spark, SF, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert 1 <= r.n_unique <= r.n_docs
        assert math.isclose(r.dup_rate, round(1 - r.n_unique / r.n_docs, 6), abs_tol=1e-9)


def test_a20_mad_robustness_bound(spark, regs):
    rows = regs["a20_mad"](spark, SF).collect()
    li = load_table(spark, SF, "lineitem")
    for r in rows:
        grp_max = (
            li.where(F.col("l_returnflag") == r.l_returnflag).agg(F.max("l_quantity")).first()[0]
        )
        # MAD is a median of absolute deviations: non-negative and no
        # larger than the group's maximum possible deviation
        assert 0 <= r.mad_qty <= grp_max
        assert r.n >= 1


def test_j15_overlap_exact_and_unique(spark, regs):
    """Binned overlap join == brute-force theta join, no duplicate pairs."""
    rows = regs["j15_interval_overlap_join"](spark, SF).collect()
    pairs = [(r.a_id, r.b_id) for r in rows]
    assert len(pairs) == len(set(pairs))  # canonical-bucket claim: unique
    ev = load_table(spark, SF, "events").where(F.col("event_type") == "error")
    L = 30 * 60 * 1_000_000_000
    us = F.col("ts") - F.col("ts") % 1000
    w = ev.select("event_id", "user_id", us.alias("s"), (us + L).alias("e"))
    a, b = w.alias("a"), w.alias("b")
    brute = (
        a.join(
            b,
            (F.col("a.user_id") < F.col("b.user_id"))
            & (F.col("a.s") <= F.col("b.e"))
            & (F.col("b.s") <= F.col("a.e")),
        )
        .where(F.col("a.user_id") < 40)
        .select(F.col("a.event_id").alias("x"), F.col("b.event_id").alias("y"))
        .collect()
    )
    assert set(pairs) == {(r.x, r.y) for r in brute}


def test_x22_crossings_alternate_direction(spark, regs):
    rows = regs["x22_threshold_crossings"](spark, SF).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for rs in by_user.values():
        # crossings must strictly alternate rise/fall within a user
        for prev, cur in zip(rs, rs[1:]):
            assert prev.direction != cur.direction


def test_crossdoc_ngram_share_bounds(spark, regs):
    rows = regs["l4_crossdoc_ngram_share"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_shared <= r.n_grams
        assert math.isclose(r.shared_frac, round(r.n_shared / r.n_grams, 6), abs_tol=1e-9)
    # duplicated docs (if any text appears twice) must have shared_frac 1.0
    docs = load_table(spark, SF, "documents")
    from pyspark.sql import functions as FF
    dup_texts = (
        docs.groupBy("text").count().where(FF.col("count") > 1).select("text")
    )
    dup_ids = {
        r.doc_id
        for r in docs.join(dup_texts, "text").select("doc_id").collect()
    }
    by_id = {r.doc_id: r for r in rows}
    for d in dup_ids:
        if d in by_id:
            assert by_id[d].shared_frac == 1.0


def test_fan_out_widens_compact_scan_and_noop_when_wide(spark):
    from kompactor_spark.tables import fan_out, load_table

    docs = load_table(spark, SF, "documents")
    target = spark.sparkContext.defaultParallelism
    fanned = fan_out(docs)
    assert fanned.rdd.getNumPartitions() >= min(target, 1)
    # already-wide input: fan_out must be an identity (no extra exchange)
    wide = docs.repartition(target + 4)
    assert fan_out(wide) is wide


def test_m8_scd2_intervals_partition_time(spark, regs):
    rows = regs["m8_scd2_history"](spark, SF).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for rs in by_user.values():
        rs.sort(key=lambda r: r.version)
        assert [r.version for r in rs] == list(range(1, len(rs) + 1))
        assert sum(1 for r in rs if r.is_current) == 1 and rs[-1].is_current
        for prev, cur in zip(rs, rs[1:]):
            assert prev.valid_to_ns == cur.valid_from_ns  # contiguous, half-open


def test_k3_rollup_equals_direct_daily(spark, regs):
    """Re-aggregated hourly limbs == one-pass daily aggregation, exactly."""
    from kompactor_spark import fixedpoint as fx
    from kompactor_spark.queries.timeseries import _NS_PER_DAY

    out = {(r.event_type, r.day_ns): r for r in regs["k3_incremental_rollup"](spark, SF).collect()}
    ev = load_table(spark, SF, "events")
    units = fx.to_units("value", 6)
    hi, lo = fx.limb_split(units)
    direct = (
        ev.select(
            "event_type",
            (F.col("ts") - F.col("ts") % _NS_PER_DAY).cast("long").alias("day_ns"),
            hi.alias("h"),
            lo.alias("l"),
        )
        .groupBy("event_type", "day_ns")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            fx.exact_sum("h", "l", 6).cast("double").alias("value_sum"),
        )
        .collect()
    )
    assert len(direct) == len(out)
    for r in direct:
        o = out[(r.event_type, r.day_ns)]
        assert o.n == r.n and o.value_sum == r.value_sum  # EXACT, not approx


def test_x24_mae_nonnegative_and_hours_bounded(spark, regs):
    rows = regs["x24_seasonal_backtest"](spark, SF).collect()
    for r in rows:
        assert r.mae >= 0 and r.total_abs_err >= 0 and r.n_hours >= 1
        assert math.isclose(r.mae, round(r.total_abs_err / r.n_hours, 6), abs_tol=1e-9)


def test_a21_winsorized_between_bounds(spark, regs):
    rows = regs["a21_winsorized_mean"](spark, SF).collect()
    for r in rows:
        assert r.p05 <= r.p95
        assert r.p05 - 1e-9 <= r.winsorized_mean <= r.p95 + 1e-9


def test_binned_interval_join_salted_equals_unsalted(spark):
    """n_salt spreads a hot bucket WITHOUT changing the result set."""
    from kompactor_spark.operators.rangejoin import binned_interval_join

    ev = load_table(spark, SF, "events")
    us = F.col("ts") - F.col("ts") % 1000
    points = ev.select("event_id", us.alias("pts"))
    incidents = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("iid"), us.alias("t0"), (us + 1800 * 10**9).alias("t1")
    )
    B = 3600 * 10**9

    def pairs(salt):
        df = binned_interval_join(points, incidents, "pts", "t0", "t1", B, n_salt=salt)
        return {(r.event_id, r.iid) for r in df.select("event_id", "iid").collect()}

    assert pairs(1) == pairs(4) != set()


def test_g1_edges_symmetric_ordered_and_min_weight(spark, regs):
    rows = regs["g1_cooccurrence_graph"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.u < r.v and r.w >= 2
    pairs = [(r.u, r.v) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_g1_kernel_matches_join_shape(spark):
    """Round-11 edge-build rewrite (g1 A/B winner): the collect_set +
    Arrow pair-expansion kernel must produce the EXACT (u, v, w) edge
    set of the pre-round-11 distinct + self-join + two-key-agg shape
    (the oracle's formulation) — on the real testdata, not a toy."""
    from kompactor_spark.queries.graph import (
        NS_PER_HOUR,
        _G1_MIN_W,
        _cooccurrence_edges,
    )

    act = (
        load_table(spark, SF, "events")
        .select(
            "user_id",
            (F.col("ts") - F.col("ts") % NS_PER_HOUR).alias("h"),
            "event_type",
        )
        .distinct()
    )
    a = act.select(F.col("user_id").alias("u"), "h", "event_type")
    b = act.select(F.col("user_id").alias("v"), "h", "event_type")
    join_shape = (
        a.join(b, ["h", "event_type"])
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
        .where(F.col("w") >= _G1_MIN_W)
    )
    expected = {(r.u, r.v, r.w) for r in join_shape.collect()}
    got = {(r.u, r.v, r.w) for r in _cooccurrence_edges(spark, SF).collect()}
    assert got == expected and got


def test_g1_kernel_hot_bucket_counts_exact(spark):
    """A 2,000-user bucket (2M pairs through one np.unique) plus
    overlapping small buckets: pair weights must be exact — the
    testdata's buckets max out at 54 users, so this pins the kernel's
    correctness in the large-bucket regime the guard permits."""
    from kompactor_spark.queries import graph as G

    big = list(range(2000))
    rows = [(big,), ([5, 10, 15],), ([10, 15],)]
    df = spark.createDataFrame(rows, "us array<bigint>")
    out = {(r.u, r.v): r.w for r in G._pair_count_kernel(df, 1).collect()}
    assert len(out) == 2000 * 1999 // 2
    assert out[(5, 10)] == 2 and out[(5, 15)] == 2 and out[(10, 15)] == 3
    assert out[(0, 1999)] == 1


def test_g1_kernel_guards_are_loud(spark):
    """The pair kernel's two preconditions fail loudly in the task
    (survive python -O): an id outside the int64 pack range, and a
    bucket whose quadratic expansion exceeds the bound."""
    import pytest as _pytest

    from kompactor_spark.queries import graph as G

    bad_id = spark.createDataFrame(
        [([1, 2, 1 << 40],)], "us array<bigint>"
    )
    with _pytest.raises(Exception, match="pack range"):
        G._pair_count_kernel(bad_id, 1).collect()

    # ADVICE r11: the bound is on PAIRS, not users — 300 users =
    # 44,850 pairs trips a 40k-pair bound before any allocation
    big = spark.createDataFrame([(list(range(300)),)], "us array<bigint>")
    old = G._G1_MAX_BUCKET_PAIRS
    G._G1_MAX_BUCKET_PAIRS = 40_000
    try:
        with _pytest.raises(Exception, match="quadratic"):
            G._pair_count_kernel(big, 1).collect()
    finally:
        G._G1_MAX_BUCKET_PAIRS = old


def test_g1_kernel_flush_budget_exact(spark):
    """Counts are flush-grain-invariant (ADVICE r11): with the
    accumulation budget forced tiny, every bucket flushes as its own
    partial frame and oversized buckets take the row-blocked expansion
    path — the summed result must be identical to the one-shot path."""
    from kompactor_spark.queries import graph as G

    big = list(range(500))  # 124,750 pairs >> the forced 1,000 budget
    rows = [(big,), ([5, 10, 15],), ([10, 15],), (list(range(100)),)]
    df = spark.createDataFrame(rows, "us array<bigint>").coalesce(1)
    baseline = {(r.u, r.v): r.w for r in G._pair_count_kernel(df, 1).collect()}
    old = G._G1_FLUSH_PAIRS
    G._G1_FLUSH_PAIRS = 1_000
    try:
        tiny = {(r.u, r.v): r.w for r in G._pair_count_kernel(df, 1).collect()}
    finally:
        G._G1_FLUSH_PAIRS = old
    assert tiny == baseline
    # (5,10) ∈ {big, [5,10,15], range(100)}; (10,15) additionally ∈ [10,15]
    assert tiny[(5, 10)] == 3 and tiny[(10, 15)] == 4
    assert tiny[(0, 499)] == 1 and len(tiny) == 500 * 499 // 2


def test_g1_null_bucket_keys_dropped(spark, tmp_path):
    """ADVICE r11: events with NULL ts or NULL event_type form buckets
    the oracle's JOIN ... USING (h, event_type) can never match — the
    engine must not emit edges from them. Users 1 and 2 co-occur twice
    in NULL-keyed buckets and only once in real ones: with the filter
    they stay below _G1_MIN_W=2 and produce NO edge, while users 3/4
    co-occur in two real buckets and do."""
    from kompactor_spark.queries.graph import NS_PER_HOUR, g1_cooccurrence_graph

    H = NS_PER_HOUR
    rows = [
        # (user_id, ts, event_type)
        (1, None, "a"), (2, None, "a"),          # NULL ts bucket
        (1, 5 * H, None), (2, 5 * H, None),      # NULL event_type bucket
        (1, 1 * H, "a"), (2, 1 * H, "a"),        # one real co-occurrence
        (3, 2 * H, "b"), (4, 2 * H, "b"),
        (3, 3 * H, "b"), (4, 3 * H, "b"),
        (None, 2 * H, "b"),                      # NULL user_id: never joins
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts bigint, event_type string")
    sf = str(tmp_path / "nullkeys")
    df.write.parquet(f"{sf}/events.parquet")
    got = {(r.u, r.v, r.w) for r in g1_cooccurrence_graph(spark, sf).collect()}
    assert got == {(3, 4, 2)}


def test_g2_degree_consistent_with_edges(spark, regs):
    edges = regs["g1_cooccurrence_graph"](spark, SF).collect()
    deg: dict = {}
    for e in edges:
        for node in (e.u, e.v):
            d = deg.setdefault(node, [0, 0])
            d[0] += 1
            d[1] += e.w
    top = regs["g2_degree_centrality"](spark, SF).collect()
    assert len(top) <= 25
    for r in top:
        assert deg[r.user_id] == [r.degree, r.weighted_degree]


def test_x25_time_weighted_avg_bounds(spark, regs):
    rows = regs["x25_time_weighted_avg"](spark, SF).collect()
    ev = load_table(spark, SF, "events")
    vmin, vmax = ev.agg(F.min("value"), F.max("value")).first()
    for r in rows:
        # a weighted mean of observed values stays within their range
        assert vmin - 1e-6 <= r.tw_avg <= vmax + 1e-6
        assert r.n_segments >= 1 and r.total_dur_us > 0


def test_langid_confusion_shares_sum_to_one(spark, regs):
    rows = regs["l4_langid_confusion"](spark, SF).collect()
    docs = load_table(spark, SF, "documents")
    assert sum(r.n for r in rows) == docs.count()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for rs in by_lang.values():
        assert abs(sum(r.share_of_true for r in rs) - 1.0) < 1e-4


def test_pareto_shares_monotone(spark, regs):
    rows = {r.top_pct: r for r in regs["w14_pareto_share"](spark, SF).collect()}
    assert set(rows) == {1, 5, 20}
    # more customers -> more cumulative share; shares in (0, 1]
    assert rows[1].revenue_share <= rows[5].revenue_share <= rows[20].revenue_share
    assert rows[1].n_top_customers <= rows[5].n_top_customers <= rows[20].n_top_customers
    for r in rows.values():
        assert 0.0 < r.revenue_share <= 1.0
        # top customers by revenue concentrate: share >= pct/100
        assert r.revenue_share >= r.top_pct / 100.0


def test_e2e_pipeline_single_scan_and_conservation(spark, regs):
    df = regs["l6_e2e_pipeline"](spark, SF)
    # One declarative plan = ONE scan of documents (gate/dedup/split/census
    # fuse; no re-reads between stages).
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    rows = df.collect()
    assert rows
    assert {r.split for r in rows} <= {"train", "val", "test"}
    # census counts can't exceed the gated corpus, and dedup can't create docs
    docs = load_table(spark, SF, "documents").count()
    assert 0 < sum(r.n_docs for r in rows) <= docs
    for r in rows:
        # every surviving doc passed the >= 20 token gate
        assert r.n_tokens_total >= 20 * r.n_docs


def test_temperature_sample_flattens_language_skew(spark, regs):
    rows = regs["l6_temperature_sample"](spark, SF).collect()
    assert rows
    total = sum(r.n_docs for r in rows)
    kept = sum(r.kept for r in rows)
    # target is half the corpus (floor rounding loses at most one doc/lang)
    assert abs(kept - 0.5 * total) <= len(rows) + 1
    for r in rows:
        assert 0 < r.kept <= r.n_docs
    # alpha < 1 flattens: bigger languages get LOWER keep rates
    by_n = sorted(rows, key=lambda r: r.n_docs)
    for lo, hi in zip(by_n, by_n[1:]):
        if lo.n_docs < hi.n_docs:
            assert lo.keep_rate >= hi.keep_rate - 1e-9


def test_pagerank_mass_conservation_and_positivity(spark, regs):
    """PageRank invariant: with no dangling nodes (symmetrized edges),
    total rank mass equals 1 (up to the 2^-40 quantization of the
    incoming sums), and every node keeps at least the teleport floor
    (1-d)/N."""
    full = regs["g3_pagerank"](spark, SF)
    # re-derive ALL node ranks, not just the top-25 query output
    from kompactor_spark.queries.graph import _cooccurrence_edges

    n_nodes = (
        _cooccurrence_edges(spark, SF)
        .select(F.explode(F.array("u", "v")).alias("n"))
        .distinct()
        .count()
    )
    rows = full.collect()
    assert 0 < len(rows) <= 25
    floor = 0.15 / n_nodes
    assert all(r.pagerank >= floor - 1e-9 for r in rows)
    # top-25 can't exceed total mass 1
    assert sum(r.pagerank for r in rows) <= 1.0 + 1e-6


def test_pq_adc_topk_orders_nonnegative_distances(spark, regs):
    rows = regs["l3h_pq_adc_topk"](spark, SF).collect()
    assert 0 < len(rows) <= 10
    ds = [r.adc_d2 for r in rows]
    assert all(d >= 0.0 for d in ds)
    assert ds == sorted(ds)
    assert all(r.vec_id != 0 for r in rows)  # query vector excluded


def test_cluster_purity_bounds_and_census(spark, regs):
    rows = regs["l7_cluster_purity"](spark, SF).collect()
    emb_n = load_table(spark, SF, "embeddings").count()
    assert sum(r.n_points for r in rows) == emb_n
    for r in rows:
        assert 1 <= r.top_count <= r.n_points
        assert 0.0 < r.purity <= 1.0
        assert abs(r.purity - round(r.top_count / r.n_points, 6)) < 1e-12


def test_ivf_pq_candidates_within_probed_cells(spark, regs):
    rows = regs["l3i_ivf_pq_topk"](spark, SF).collect()
    assert 0 < len(rows) <= 10
    ds = [r.adc_d2 for r in rows]
    assert ds == sorted(ds) and all(d >= 0.0 for d in ds)
    # IVF pruning: results are a subset of the plain-ADC ranking's corpus,
    # and must exclude the query vector
    assert all(r.vec_id != 0 for r in rows)


def test_tfidf_cosine_pairs_bounds(spark, regs):
    rows = regs["l2_tfidf_cosine_pairs"](spark, SF).collect()
    for r in rows:
        assert r.id_a < r.id_b
        assert 0.4 - 1e-9 <= r.cosine <= 1.0 + 1e-9


def test_tv_drift_bounds(spark, regs):
    rows = regs["l4_tv_drift"](spark, SF).collect()
    srcs = {r.source for r in rows}
    docs = load_table(spark, SF, "documents")
    assert srcs == {r.source for r in docs.select("source").distinct().collect()}
    assert all(0.0 <= r.tv_distance <= 1.0 for r in rows)


def test_gini_in_unit_interval(spark, regs):
    row = regs["w15_gini_revenue"](spark, SF).first()
    assert row.n_customers > 0
    assert 0.0 <= row.gini < 1.0


def test_partition_overwrite_preserves_row_count(spark, regs):
    out = regs["m7_dynamic_partition_overwrite"](spark, SF)
    n_events = load_table(spark, SF, "events").count()
    assert out.count() == n_events  # dynamic mode never truncates other partitions


def test_cdc_apply_delete_and_reinsert_semantics(spark, regs):
    rows = regs["m9_cdc_apply"](spark, SF).collect()
    keys = {r.o_orderkey for r in rows}
    orders = {r.o_orderkey for r in load_table(spark, SF, "orders").select("o_orderkey").collect()}
    for k in orders:
        if k % 200 == 0 and k % 400 != 0:
            assert k not in keys  # deleted
        else:
            assert k in keys
    for r in rows:
        if r.o_orderkey % 400 == 0:
            assert r.o_orderstatus == "R" and r.o_totalprice == 1.0


def test_trend_slope_covers_all_event_types(spark, regs):
    rows = regs["x26_trend_slope"](spark, SF).collect()
    types = {r.event_type for r in load_table(spark, SF, "events").select("event_type").distinct().collect()}
    assert {r.event_type for r in rows} <= types
    assert all(r.n_samples > 1 for r in rows)


def test_max_concurrency_bounds(spark, regs):
    rows = regs["x23_max_concurrency"](spark, SF).collect()
    ev = load_table(spark, SF, "events")
    per_type = {r.event_type: r["count"] for r in ev.groupBy("event_type").count().collect()}
    for r in rows:
        # peak is at least 1 and can never exceed the series event count
        assert 1 <= r.peak_concurrency <= per_type[r.event_type]
        assert r.first_peak_ns > 0


def test_interval_coverage_bounds(spark, regs):
    rows = regs["x27_interval_coverage"](spark, SF).collect()
    hold = 300_000_000_000
    ev = load_table(spark, SF, "events")
    per_user = {r.user_id: r["count"] for r in ev.groupBy("user_id").count().collect()}
    assert {r.user_id for r in rows} == set(per_user)
    for r in rows:
        n = per_user[r.user_id]
        # union of n intervals of length `hold` covers between `hold`
        # (all overlapping) and n*hold (all disjoint) nanoseconds
        assert hold <= r.covered_ns <= n * hold
        assert 1 <= r.n_islands <= n


def test_latency_bands_monotone_percentiles(spark, regs):
    rows = regs["x28_latency_bands"](spark, SF).collect()
    for r in rows:
        assert 0 <= r.hour_of_day <= 23
        assert r.p50 <= r.p95 <= r.p99
        assert r.n >= 1


def test_equi_depth_buckets_near_uniform(spark, regs):
    rows = regs["a22_equi_depth_histogram"](spark, SF).collect()
    n_orders = load_table(spark, SF, "orders").count()
    assert sum(r.n for r in rows) == n_orders
    assert [r.bucket for r in rows] == list(range(1, len(rows) + 1))
    # equi-depth: every bucket within 2x of the ideal share (ties and
    # interpolation can shift boundaries slightly, never grossly)
    ideal = n_orders / 10
    assert all(0.5 * ideal <= r.n <= 2.0 * ideal for r in rows)
    # bucket value ranges are disjoint and ordered
    for lo_r, hi_r in zip(rows, rows[1:]):
        assert lo_r.hi <= hi_r.lo


def test_ab_ztest_split_is_balanced_and_finite(spark, regs):
    rows = regs["a23_ab_ztest"](spark, SF).collect()
    for r in rows:
        assert r.n_a > 0 and r.n_b > 0
        # md5 parity split should be roughly even (binomial, wide margin)
        assert 0.2 <= r.n_a / (r.n_a + r.n_b) <= 0.8
        assert math.isfinite(r.z_welch)


def test_chi_square_row_identities(spark, regs):
    rows = regs["a24_chi_square"](spark, SF).collect()
    # expected counts preserve row totals and contributions are >= 0
    for r in rows:
        assert abs((r.e0 + r.e1) - (r.o0 + r.o1)) < 1e-3
        assert r.chi2_contrib >= 0.0


def test_triangle_counts_consistent_with_edges(spark, regs):
    rows = regs["g4_triangle_count"](spark, SF).collect()
    for r in rows:
        assert r.n_triangles >= 1


def test_ttr_hapax_bounds(spark, regs):
    rows = regs["l4_ttr_hapax"](spark, SF).collect()
    for r in rows:
        assert 1 <= r.n_types <= r.n_tokens
        assert 0 <= r.n_hapax <= r.n_types
        assert 0.0 < r.ttr <= 1.0
        assert 0.0 <= r.hapax_share <= 1.0


def test_last_touch_attribution_census(spark, regs):
    rows = regs["x29_last_touch_attribution"](spark, SF).collect()
    n_purchases = (
        load_table(spark, SF, "events").where(F.col("event_type") == "purchase").count()
    )
    assert sum(r.n_conversions for r in rows) == n_purchases
    assert {r.channel for r in rows} <= {"click", "view", "(none)"}


def test_band_join_covers_every_event(spark, regs):
    rows = regs["j16_band_join_lookup"](spark, SF).collect()
    n_events = load_table(spark, SF, "events").count()
    assert sum(r.n for r in rows) == n_events  # bands partition [0, inf)
    assert all(r.charged > 0 for r in rows)


def test_skew_report_shares(spark, regs):
    rows = regs["m10_skew_report"](spark, SF).collect()
    n_users = load_table(spark, SF, "events").select("user_id").distinct().count()
    assert len(rows) == min(20, n_users)
    # descending counts, cumulative share monotone and <= 1
    for a, b in zip(rows, rows[1:]):
        assert a.n >= b.n
        assert a.cum_share <= b.cum_share + 1e-9
    assert rows[-1].cum_share <= 1.0 + 1e-9
    assert all(0 < r.share <= r.cum_share + 1e-9 for r in rows)


def test_neighbor_jaccard_bounds(spark, regs):
    rows = regs["g5_neighbor_jaccard"](spark, SF).collect()
    for r in rows:
        assert 0.0 <= r.jaccard <= 1.0
        assert r.common >= 0


def test_rate_spike_bounds(spark, regs):
    rows = regs["x30_rate_spike"](spark, SF).collect()
    ev = load_table(spark, SF, "events")
    per_user = {r.user_id: r["count"] for r in ev.groupBy("user_id").count().collect()}
    assert {r.user_id for r in rows} == set(per_user)
    for r in rows:
        assert 1 <= r.peak_rate <= per_user[r.user_id]
        assert 0 <= r.n_burst_events <= per_user[r.user_id]


def test_cohort_ltv_cumulative_monotone(spark, regs):
    rows = regs["x31_cohort_ltv"](spark, SF).collect()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_week, []).append(r)
    for seq in by_cohort.values():
        assert [r.weeks_since for r in seq] == sorted(r.weeks_since for r in seq)
        assert all(r.weeks_since >= 0 for r in seq)
        cum = 0.0
        for r in seq:
            assert r.revenue > 0
            cum += r.revenue
            assert abs(r.cum_revenue - cum) < 1e-6 * max(1.0, cum)


def test_dimension_stats_one_row_per_dim(spark, regs):
    rows = regs["l7f_dimension_stats"](spark, SF).collect()
    n_vecs = load_table(spark, SF, "embeddings").count()
    dims = load_table(spark, SF, "embeddings").select(F.size("embedding")).first()[0]
    assert len(rows) == dims
    for r in rows:
        assert r.n == n_vecs
        assert r.var_x >= 0.0
        assert r.min_x <= r.mean_x <= r.max_x


def test_point_in_time_join_state_precedes_fact(spark, regs):
    rows = regs["j17_point_in_time_join"](spark, SF).collect()
    ev = load_table(spark, SF, "events")
    sign = {}
    for r in (
        ev.where(F.col("event_type") == "signup")
        .select("user_id", (F.col("ts") - F.col("ts") % 1000).alias("t"), "value")
        .collect()
    ):
        sign.setdefault(r.user_id, []).append((r.t, r.value))
    for r in rows:
        states = sorted(t for t, _ in sign[r.user_id])
        # version counts exactly the signups at-or-before the purchase
        assert r.state_version == sum(1 for t in states if t <= r.ts_ns)
        assert r.state_version >= 1


def test_alert_episodes_subset_of_x18(spark, regs):
    eps = regs["x32_alert_episodes"](spark, SF).collect()
    alerts = regs["x18_rolling_zscore"](spark, SF).collect()
    n_alerts = len(alerts)
    assert sum(r.n_alerts for r in eps) == n_alerts
    for r in eps:
        assert r.start_ns <= r.end_ns
        assert r.peak_severity >= 3.0


def test_row_fingerprint_no_collisions(spark, regs):
    rows = regs["f13_row_fingerprint"](spark, SF).collect()
    n_cust = load_table(spark, SF, "customer").count()
    assert sum(r.n_rows for r in rows) == n_cust
    for r in rows:
        assert r.n_distinct == r.n_rows  # canonical rows are unique
        assert len(r.min_sha) == 64 and len(r.max_sha) == 64
        assert r.min_sha <= r.max_sha


def test_weighted_median_is_weight_balanced(spark, regs):
    rows = regs["a25_weighted_median"](spark, SF).collect()
    li = load_table(spark, SF, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    ).collect()
    for r in rows:
        grp = [(x.l_extendedprice, x.l_quantity) for x in li if x.l_returnflag == r.l_returnflag]
        below = sum(q for p, q in grp if p < r.weighted_median)
        at_or_below = sum(q for p, q in grp if p <= r.weighted_median)
        total = sum(q for _, q in grp)
        assert abs(total - r.total_weight) < 1e-6
        # defining property of the weighted median cut
        assert below * 2 < total + 1e-9 <= at_or_below * 2 + 1e-9


def test_vocab_coverage_monotone_in_k(spark, regs):
    rows = regs["l4_vocab_coverage"](spark, SF).collect()
    assert [r.k for r in rows] == sorted(r.k for r in rows)
    for a, b in zip(rows, rows[1:]):
        assert a.covered <= b.covered and a.total == b.total
    for r in rows:
        assert 0 < r.covered <= r.total
        assert 0.0 < r.coverage <= 1.0


def test_source_diversity_entropy_bounds(spark, regs):
    rows = regs["l6_source_diversity"](spark, SF).collect()
    for r in rows:
        assert r.entropy >= 0.0
        # 1 <= exp(H) <= n_sources (max entropy = uniform over sources)
        assert 1.0 - 1e-6 <= r.effective_sources <= r.n_sources + 1e-6


def test_assortativity_in_unit_interval(spark, regs):
    row = regs["g6_degree_assortativity"](spark, SF).first()
    assert row.m > 0
    assert -1.0 <= row.assortativity <= 1.0


def test_stickiness_bounds(spark, regs):
    rows = regs["x33_active_user_stickiness"](spark, SF).collect()
    for r in rows:
        assert 1 <= r.dau <= r.wau  # trailing-7 superset of the day
        assert 0.0 < r.stickiness <= 1.0


def test_length_profile_identities(spark, regs):
    rows = regs["l6_length_profile"](spark, SF).collect()
    docs = load_table(spark, SF, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert r.p10 <= r.p50 <= r.p90
        assert r.p10 <= r.mean_tokens <= r.total_tokens
        assert abs(r.mean_tokens - r.total_tokens / r.n_docs) < 1e-3


def test_basket_lift_identities(spark, regs):
    rows = regs["m11_basket_lift"](spark, SF).collect()
    for r in rows:
        assert r.p1 < r.p2
        assert r.both >= 3
        assert r.both <= min(r.s1, r.s2)
        assert 0.0 < r.support <= 1.0
        assert 0.0 < r.confidence <= 1.0
        assert r.lift > 0.0
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)


def test_rolling_slope_full_window_only(spark, regs):
    rows = regs["x34_rolling_slope"](spark, SF).collect()
    ev = load_table(spark, SF, "events")
    per_user = {r.user_id: r["count"] for r in ev.groupBy("user_id").count().collect()}
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for u, rs in by_user.items():
        # exactly count-K+1 full windows per user (K=8)
        assert len(rs) == max(0, per_user[u] - 7)
        for r in rs:
            assert math.isfinite(r.slope_per_s)


def test_seasonality_strength_bounds(spark, regs):
    rows = regs["x35_seasonality_strength"](spark, SF).collect()
    for r in rows:
        assert r.ss_total > 0
        # variance decomposition: 0 <= SS_between <= SS_total
        assert -1e-6 <= r.ss_between <= r.ss_total + 1e-6
        assert -1e-6 <= r.eta_sq <= 1.0 + 1e-6


def test_benford_is_a_distribution(spark, regs):
    rows = regs["a26_benford"](spark, SF).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.observed for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.expected for r in rows) - 1.0) < 1e-3  # Benford sums to 1 over 1..9
    for r in rows:
        assert abs(r.deviation - round(r.observed - r.expected, 6)) < 2e-6


def test_autocorrelation_bounds(spark, regs):
    rows = regs["x36_count_autocorrelation"](spark, SF).collect()
    for r in rows:
        assert r.lag_hours in (1, 24)
        assert r.n_pairs > 0
        assert -1.0 - 1e-9 <= r.acf <= 1.0 + 1e-9


def test_cross_type_correlation_pairs(spark, regs):
    rows = regs["x37_cross_type_correlation"](spark, SF).collect()
    types = {
        r.event_type
        for r in load_table(spark, SF, "events").select("event_type").distinct().collect()
    }
    k = len(types)
    assert len(rows) == k * (k - 1) // 2
    for r in rows:
        assert r.type_a < r.type_b
        assert -1.0 - 1e-9 <= r.corr_counts <= 1.0 + 1e-9


def test_cumulative_crossover_alternates(spark, regs):
    rows = regs["x38_cumulative_crossover"](spark, SF).collect()
    # consecutive crossover rows must carry different lead signs
    for a, b in zip(rows, rows[1:]):
        assert a.hour_ns < b.hour_ns
        assert a.lead_sign != b.lead_sign
    for r in rows:
        if r.lead_sign == 1:
            assert r.cum_click > r.cum_view
        elif r.lead_sign == -1:
            assert r.cum_click < r.cum_view
        else:
            assert r.cum_click == r.cum_view


def test_asof_forward_next_at_or_after(spark, regs):
    rows = regs["j8c_asof_forward"](spark, SF).collect()
    ev = load_table(spark, SF, "events")
    us = (F.col("ts") - F.col("ts") % 1000).alias("t")
    purchases: dict = {}
    for r in ev.where(F.col("event_type") == "error").select("event_id").collect():
        pass
    for r in ev.where(F.col("event_type") == "purchase").select("user_id", us).collect():
        purchases.setdefault(r.user_id, []).append(r.t)
    n_errors = ev.where(F.col("event_type") == "error").count()
    assert len(rows) == n_errors  # left join: every error appears
    for r in rows:
        cand = sorted(t for t in purchases.get(r.user_id, []) if t >= r.err_ts)
        if cand:
            assert r.next_purchase_ts == cand[0]
        else:
            assert r.next_purchase_ts is None


def test_bpe_train_matches_pure_python_reference(spark, regs):
    from kompactor_spark.operators.text import train_bpe_merges_reference

    got = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in regs["l4_bpe_train"](spark, SF).collect()
    ]
    texts = [r.text for r in load_table(spark, SF, "documents").select("text").collect()]
    want = [
        (m["rank"], m["left"], m["right"], m["pair_count"])
        for m in train_bpe_merges_reference(texts, 8)
    ]
    assert got == want
    # learned merges are usable: counts non-increasing is NOT guaranteed
    # (a merged symbol can participate in later frequent pairs), but
    # every count is positive and ranks are dense
    assert [g[0] for g in got] == list(range(len(got)))
    assert all(g[3] > 0 for g in got)


def test_burstiness_positive(spark, regs):
    rows = regs["x39_burstiness"](spark, SF).collect()
    for r in rows:
        assert r.n_hours > 1
        assert r.mean_per_hour > 0
        assert r.fano >= 0.0


def test_ngram_novelty_bounds(spark, regs):
    row = regs["l6_ngram_novelty"](spark, SF).first()
    assert 0 <= row.n_novel <= row.n_val_grams
    assert 0.0 <= row.novelty <= 1.0


def test_profile_drift_metrics_complete(spark, regs):
    rows = regs["m12_profile_drift"](spark, SF).collect()
    metrics = {r.metric for r in rows}
    assert metrics == {
        "n_rows",
        "distinct_custkey",
        "distinct_status",
        "min_totalprice",
        "max_totalprice",
    }
    for r in rows:
        assert r.v1 is not None and r.v2 is not None
        assert abs(r.delta - round(r.v2 - r.v1, 6)) < 2e-6


def test_pca_power_explained_share_bounds(spark, regs):
    row = regs["l7g_pca_power"](spark, SF).first()
    emb = load_table(spark, SF, "embeddings")
    dims = len(emb.select("embedding").first()[0])
    assert row.n_vecs == emb.count()
    assert row.top_eigenvalue > 0
    # top eigenvalue explains at least 1/d and at most all of the variance
    assert 1.0 / dims - 1e-6 <= row.explained_share <= 1.0 + 1e-6


def test_max_drawdown_invariants(spark, regs):
    rows = regs["x40_max_drawdown"](spark, SF).collect()
    for r in rows:
        assert r.n_purchases >= 1
        assert r.max_drawdown >= 0.0
        # drawdown can never exceed peak minus the global minimum; weak
        # but engine-independent: drawdown <= 2 * peak magnitude bound
        assert r.max_drawdown <= abs(r.peak_cum) + 100.0 * r.n_purchases


def test_nearest_value_join_is_nearest(spark, regs):
    rows = regs["j19_nearest_value_join"](spark, SF).collect()
    li = load_table(spark, SF, "lineitem")
    assert len(rows) == li.count()  # Voronoi cells tile the whole axis
    prices = sorted(
        r.p for r in load_table(spark, SF, "part").select(
            F.col("p_retailprice").alias("p")
        ).distinct().collect()
    )
    import bisect

    for r in rows[:500]:
        i = bisect.bisect_left(prices, r.unit_price)
        cands = [prices[j] for j in (i - 1, i, i + 1) if 0 <= j < len(prices)]
        best = min(abs(r.unit_price - c) for c in cands)
        assert abs(r.diff - best) < 1e-9
        assert abs(abs(r.unit_price - r.nearest_price) - best) < 1e-9


def test_multi_measure_pivot_census(spark, regs):
    rows = regs["p6_multi_measure_pivot"](spark, SF).collect()
    n_orders = load_table(spark, SF, "orders").count()
    assert sum(r.f_n + r.o_n + r.p_n for r in rows) == n_orders
    for r in rows:
        for st in ("f", "o", "p"):
            n, rev = r[f"{st}_n"], r[f"{st}_rev"]
            assert (n == 0) == (rev is None)
            if n:
                assert rev > 0


def test_binned_interval_join_extra_keys_matches_naive(spark):
    """extra_keys (the per-entity lookback shape, round-8 x9 re-key):
    the composite (entity, bucket) join must produce exactly the pairs
    of the naive entity-equi + range theta join, with and without
    salting."""
    from kompactor_spark.operators.rangejoin import binned_interval_join

    ev = load_table(spark, SF, "events")
    us = F.col("ts") - F.col("ts") % 1000
    day = 24 * 3600 * 10**9
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("user_id").alias("e_user"),
        us.alias("err_ts"),
        (us - day).alias("lb"),
    )
    signups = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user"),
        us.alias("s_ts"),
    )
    naive = {
        (r.err_id, r.signup_id)
        for r in errors.join(
            signups,
            (F.col("e_user") == F.col("s_user"))
            & (F.col("s_ts") >= F.col("lb"))
            & (F.col("s_ts") <= F.col("err_ts")),
        ).collect()
    }
    for salt in (1, 3):
        binned = {
            (r.err_id, r.signup_id)
            for r in binned_interval_join(
                signups, errors, "s_ts", "lb", "err_ts", day,
                n_salt=salt, extra_keys=[("s_user", "e_user")],
            ).collect()
        }
        assert binned == naive != set()


def test_trend_slope_null_event_type_group_survives(spark, tmp_path):
    """ADVICE r13: the round-13 recentre replaced min() OVER (PARTITION
    BY event_type) with a broadcast equi-join on event_type — a plain
    join key silently drops the NULL group the window used to keep. The
    fix joins null-safely (<=>), so a NULL event_type series must still
    produce its slope row (value = 1.0 per second here → slope 1.0)."""
    from kompactor_spark.queries.timeseries import x26_trend_slope

    NS = 1_000_000_000
    rows = []
    for i in range(4):
        rows.append((i, i * NS, 1, None, float(i), "{}"))          # NULL series
        rows.append((10 + i, i * NS, 1, "click", 2.0 * i, "{}"))   # real series
    df = spark.createDataFrame(
        rows, "event_id bigint, ts bigint, user_id bigint, event_type string, value double, props string"
    )
    sf = str(tmp_path / "nulltype")
    df.write.parquet(f"{sf}/events.parquet")
    got = {r.event_type: (r.n_samples, r.slope_per_s) for r in x26_trend_slope(spark, sf).collect()}
    assert got == {None: (4, 1.0), "click": (4, 2.0)}
