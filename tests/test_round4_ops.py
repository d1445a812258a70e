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
