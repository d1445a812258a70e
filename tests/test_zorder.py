"""Z-order clustering: Morton interleave correctness + the actual
payoff — parquet footer min/max stats prune files on EVERY z-ordered
dimension, not just the sort-leading one."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from kompactor_spark.operators.zorder import interleave_bits, zorder_layout, zvalue
from kompactor_spark.tables import loader

SF = "/root/testdata/sf0.001"


def test_interleave_bits_unit(spark):
    df = spark.createDataFrame([(3, 0), (0, 3), (2, 1)], "a int, b int")
    got = [
        r.z
        for r in df.select(
            interleave_bits([F.col("a"), F.col("b")], bits=2).alias("z")
        ).collect()
    ]
    # bit j of col c -> position j*2 + c: a=0b11 -> 0b0101, b=0b11 -> 0b1010,
    # (a=0b10, b=0b01) -> a1@pos2, b0@pos1 -> 0b0110
    assert got == [0b0101, 0b1010, 0b0110]


def _file_stats(path_glob, cols):
    out = []
    for p in sorted(glob.glob(path_glob)):
        md = pq.read_metadata(p)
        mins, maxs = {}, {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    s = col.statistics
                    mins[name] = min(mins.get(name, s.min), s.min)
                    maxs[name] = max(maxs.get(name, s.max), s.max)
        if mins:
            out.append({c: (mins[c], maxs[c]) for c in cols})
    return out


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """Files written z-ordered by (user_id, ts) each cover a compact
    rectangle: a point predicate on user_id AND a range predicate on
    ts both skip files on footer stats. A ts-sorted layout can only
    skip on ts — every file spans all users."""
    ev = loader(SF, spark)("events").select("event_id", "user_id", "ts")
    n_files = 8

    zdir = str(tmp_path / "zorder")
    zorder_layout(ev, ["user_id", "ts"], num_files=n_files).write.parquet(zdir)
    tdir = str(tmp_path / "tsorted")
    ev.repartitionByRange(n_files, "ts").sortWithinPartitions("ts").write.parquet(tdir)

    zstats = _file_stats(f"{zdir}/*.parquet", ["user_id", "ts"])
    tstats = _file_stats(f"{tdir}/*.parquet", ["user_id", "ts"])
    assert len(zstats) == n_files and len(tstats) == n_files

    mid_user = ev.agg(F.expr("percentile(user_id, 0.5)")).first()[0]
    lo_ts, hi_ts = ev.agg(F.min("ts"), F.max("ts")).first()
    day_lo = lo_ts + (hi_ts - lo_ts) // 2
    day_hi = day_lo + (hi_ts - lo_ts) // 8

    def files_hit(stats, col, lo, hi):
        return sum(1 for s in stats if not (s[col][1] < lo or s[col][0] > hi))

    # ts predicates prune in BOTH layouts
    assert files_hit(zstats, "ts", day_lo, day_hi) < n_files
    assert files_hit(tstats, "ts", day_lo, day_hi) < n_files
    # user predicate: z-order prunes, time-sort cannot
    z_user_hits = files_hit(zstats, "user_id", mid_user, mid_user)
    t_user_hits = files_hit(tstats, "user_id", mid_user, mid_user)
    assert t_user_hits == n_files, "ts-sorted files each span all users"
    assert z_user_hits < n_files, f"z-order must prune on user_id, hit {z_user_hits}"

    # layout is a reshuffle, never a row transform
    assert zvalue(ev, ["user_id", "ts"]).count() == ev.count()
    back = spark.read.parquet(zdir)
    assert back.count() == ev.count()
    assert back.select(F.sum("event_id")).first()[0] == ev.select(F.sum("event_id")).first()[0]


def test_ivf_materialized_index_partition_pruning(spark, tmp_path):
    """The materialized IVF index reads ONLY the probed cells'
    partition directories (driver-side centroid probe → partition
    filter), and recall vs exact brute force stays high."""
    from kompactor_spark.operators.simsearch import (
        brute_force_topk,
        build_ivf_index,
        ivf_index_topk,
    )

    emb = loader("/root/testdata/sf0.01", spark)("embeddings")  # 200 vectors; sf0.001's 20 are degenerate for 16 cells
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 0).first().embedding]
    corpus = emb.where(F.col("vec_id") != 0)

    idx = str(tmp_path / "ivf")
    build_ivf_index(corpus, idx, n_clusters=8, seed=42)

    got = ivf_index_topk(spark, idx, qvec, k=10, n_probe=4)
    # the cell predicate must be a PARTITION filter (pruned before I/O,
    # directory-level), not a post-scan row filter
    p = got._jdf.queryExecution().executedPlan().toString()
    scan = [l for l in p.splitlines() if "PartitionFilters" in l]
    assert scan and "_cell" in scan[0], p
    assert len(spark.read.parquet(f"{idx}/cells").inputFiles()) >= 8
    truth = {r.vec_id for r in brute_force_topk(corpus, qvec, k=10).collect()}
    hits = {r.vec_id for r in got.collect()}
    recall = len(truth & hits) / len(truth)
    assert recall >= 0.6, f"recall {recall}"


def test_cosine_to_query_dimension_mismatch_is_null(spark):
    """A stored vector whose length differs from the query gets a NULL
    cosine — never a silently truncated norm/dot (ADVICE r9). Matching
    vectors are unaffected, in both the unrolled (narrow) and fold
    (wide) kernel paths."""
    from kompactor_spark.operators.simsearch import _UNROLL_MAX_DIM, cosine_to_query

    for d in (4, _UNROLL_MAX_DIM + 8):  # unroll path and fold path
        q = [1.0] + [0.0] * (d - 1)
        df = spark.createDataFrame(
            [
                (1, q),                      # exact match -> cosine 1.0
                (2, q + [9.0]),              # longer than query -> NULL
                (3, q[: d - 1]),             # shorter than query -> NULL
            ],
            "vec_id long, embedding array<double>",
        )
        got = {r.vec_id: r.cosine for r in cosine_to_query(df, q).collect()}
        assert got[1] == pytest.approx(1.0)
        assert got[2] is None and got[3] is None, (d, got)
