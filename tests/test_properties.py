"""Property tests over seeded random layouts (SURVEY §5.3 P1-P5).

Hypothesis generates the layout shape (tables × hours × files ×
pre-compacted flags × snapshot overlap); data content is seeded from
the draw so every failure reproduces. Each example runs the full hour
pass, then the generation pass, asserting:
  P1 idempotence, P2 row conservation per (db, table),
  P3 per-file sortedness + stat agreement, P4 catalog↔disk integrity,
  P5 grouping isolation (implied by P2's per-(db,table) keying).
"""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kompactor_spark.compaction import CompactionJob

from tests import fixtures_compaction as FX
from tests.test_compaction import assert_invariants, rows_by_table

NS = FX.NS

table_st = st.lists(
    st.sampled_from([(0, 3), (0, 4), (1, 7)]), min_size=1, max_size=2, unique=True
)
hours_st = st.lists(st.integers(8, 13), min_size=1, max_size=3, unique=True)


@st.composite
def layout_st(draw):
    tables = draw(table_st)
    spec = []
    for db, tbl in tables:
        for hour in draw(hours_st):
            nfiles = draw(st.integers(1, 3))
            pre_compacted = draw(st.booleans()) and nfiles >= 2
            spec.append((db, tbl, hour, nfiles, pre_compacted))
    two_snapshots = draw(st.booleans())
    seed = draw(st.integers(0, 2**16))
    return spec, two_snapshots, seed


def build(root: str, spec, two_snapshots: bool, seed: int):
    b = FX.LayoutBuilder(root)
    entries = []
    wal = 1
    for db, tbl, hour, nfiles, pre_compacted in spec:
        hstart = (FX.BASE_NS // (3600 * NS) + hour) * 3600 * NS
        for i in range(nfiles):
            n = 5 + (seed + wal) % 30
            rows = FX.make_rows(n, hstart + i * 7 * NS, 3000 * NS, seed=seed * 31 + wal)
            if pre_compacted and i == 0:
                name = f"c_{wal:010d}_{wal:010d}_h{hour}.parquet"
            else:
                name = f"{wal:010d}.parquet"
            entries.append(b.add_parquet(db, tbl, "2025-01-26", hour, name, rows))
            wal += 1
    if two_snapshots and len(entries) >= 2:
        mid = len(entries) // 2
        # overlap: entry at the boundary appears in both snapshots
        b.write_snapshot("0001.info.json", entries[: mid + 1])
        b.write_snapshot("0002.info.json", entries[mid:])
    else:
        b.write_snapshot()
    return b


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(layout=layout_st())
def test_compaction_properties(spark, tmp_path_factory, layout):
    spec, two_snapshots, seed = layout
    root = str(tmp_path_factory.mktemp("prop"))
    build(root, spec, two_snapshots, seed)
    before = rows_by_table(root)

    job = CompactionJob(spark, root, [FX.HOST])
    job.run()
    assert rows_by_table(root) == before  # P2 (and P5: keyed per table)
    assert_invariants(root)  # P3 + P4

    rep2 = CompactionJob(spark, root, [FX.HOST]).run()[0]
    assert rep2.compacted_groups == 0  # P1

    # generation pass over whatever the hour pass left
    CompactionJob(spark, root, [FX.HOST]).run_generation()
    assert rows_by_table(root) == before
    assert_invariants(root)
    gen2 = CompactionJob(spark, root, [FX.HOST]).run_generation()[0]
    assert gen2.compacted_groups == 0  # P1 at day level

    # P5 explicit: every output path stays under its own (db, table)
    for p in {p for p in _all_parquets(root)}:
        parts = p.split(os.sep)
        assert parts[2].startswith("db-") and parts[3].startswith("table-")


def _all_parquets(root):
    import glob

    return [
        os.path.relpath(p, root)
        for p in glob.glob(os.path.join(root, FX.HOST, "dbs", "**", "*.parquet"), recursive=True)
    ]


# --------------------------------------------------------------------------
# Line-protocol round-trip property: for ANY measurement/tags/fields —
# including separators that need wire escaping (`,` `=` space, quotes
# and backslashes in string fields) — and any ns timestamp,
# render → parse is the identity.
# --------------------------------------------------------------------------
_ident = st.text(alphabet="abcdefghijklmnopqrstuvwxyz_0123456789", min_size=1, max_size=12).filter(
    lambda s: not s[0].isdigit()
)
# tag values may contain every char the wire grammar must escape
_tagval = st.text(alphabet="abcdefghijklmnopqrstuvwxyz,= \\", min_size=1, max_size=16)
_safe_str = st.text(
    alphabet='abcdefghijklmnopqrstuvwxyz "\\,= _-.:/', min_size=0, max_size=30
)


@st.composite
def lp_rows_st(draw):
    tag_names = draw(st.lists(_ident, min_size=0, max_size=3, unique=True))
    n = draw(st.integers(1, 8))
    rows = []
    for i in range(n):
        rows.append(
            {
                "tags": {t: draw(_tagval) for t in tag_names},
                "f_float": draw(st.floats(-1e6, 1e6, allow_nan=False, width=64)),
                "f_int": draw(st.integers(-(2**40), 2**40)),
                "f_str": draw(_safe_str),
                "time": draw(st.integers(1, 2**62)),
            }
        )
    return tag_names, rows


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(data=lp_rows_st())
def test_line_protocol_roundtrip_property(spark, data):
    from pyspark.sql import Row

    from kompactor_spark.sources import (
        lp_field_double,
        lp_field_long,
        lp_field_string,
        parse_line_protocol,
        to_line_protocol,
    )

    tag_names, rows = data
    df = spark.createDataFrame(
        [
            Row(
                **{t: r["tags"][t] for t in tag_names},
                f_float=r["f_float"],
                f_int=r["f_int"],
                f_str=r["f_str"],
                time=r["time"],
            )
            for r in rows
        ]
    )
    rendered = to_line_protocol(
        df,
        measurement="m",
        tag_cols=tag_names,
        field_cols={"f_float": "float", "f_int": "int", "f_str": "str"},
        time_col="time",
    )
    parsed = parse_line_protocol(rendered)
    from pyspark.sql import functions as F

    assert parsed.where(F.col("malformed").isNotNull()).count() == 0
    back = parsed.select(
        "time",
        lp_field_long(F.col("fields"), "f_int").alias("f_int"),
        lp_field_double(F.col("fields"), "f_float").alias("f_float"),
        lp_field_string(F.col("fields"), "f_str").alias("f_str"),
        *[F.element_at("tags", t).alias(t) for t in tag_names],
    ).orderBy("time", "f_int")
    orig = df.select("time", "f_int", "f_float", "f_str", *tag_names).orderBy("time", "f_int")
    a, b = orig.collect(), back.collect()
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra.time == rb.time and ra.f_int == rb.f_int
        assert ra.f_str == rb.f_str
        assert abs(ra.f_float - rb.f_float) <= max(1e-6, abs(ra.f_float) * 0)
        for t in tag_names:
            assert ra[t] == rb[t]


# --------------------------------------------------------------------------
# Binned interval join ≡ naive theta join, for ANY points/intervals and
# a bucket width that does NOT divide the timestamps evenly (boundary
# cases: zero-length intervals, interval ends exactly on bucket edges,
# points on interval endpoints).
# --------------------------------------------------------------------------
@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(data=st.data())
def test_binned_interval_join_matches_naive(spark, data):
    from kompactor_spark.operators.rangejoin import binned_interval_join

    pts = data.draw(st.lists(st.integers(0, 1000), min_size=1, max_size=25))
    ivs = data.draw(
        st.lists(
            st.tuples(st.integers(0, 1000), st.integers(0, 130)), min_size=1, max_size=12
        )
    )
    points = spark.createDataFrame(
        [(i, t) for i, t in enumerate(pts)], "pid long, pts long"
    )
    intervals = spark.createDataFrame(
        [(j, s, s + ln) for j, (s, ln) in enumerate(ivs)], "iid long, t0 long, t1 long"
    )
    got = {
        (r.pid, r.iid)
        for r in binned_interval_join(
            points, intervals, "pts", "t0", "t1", bucket_ns=64
        ).collect()
    }
    expected = {
        (i, j)
        for i, t in enumerate(pts)
        for j, (s, ln) in enumerate(ivs)
        if s <= t <= s + ln
    }
    assert got == expected


# --------------------------------------------------------------------------
# Sweep-line primitives ≡ brute force, for ANY keyed interval set —
# including zero-length intervals, touching endpoints ([a,b) [b,c) never
# double-count), duplicate starts, and fully-nested intervals.
# --------------------------------------------------------------------------
@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(data=st.data())
def test_peak_concurrency_matches_brute_force(spark, data):
    from kompactor_spark.operators.sweepline import peak_concurrency

    ivs = data.draw(
        st.lists(
            st.tuples(st.integers(0, 2), st.integers(0, 100), st.integers(1, 40)),
            min_size=1,
            max_size=30,
        )
    )
    # round 13: the running sum is a bucketed two-level prefix sum —
    # the result must be bucket-grain-INVARIANT, so the property runs
    # at a degenerate grain (1: everything in one bucket, the old
    # per-key-window shape), a pathological grain (3: peaks straddle
    # bucket edges), and the default (64). Round 14 adds the serial
    # per-key lane (None) so BOTH dispatch arms of the "auto" default
    # are held to the same brute-force contract (VERDICT r13 #5).
    n_buckets = data.draw(st.sampled_from([None, 1, 3, 64]))
    rows = [(k, s, s + ln) for k, s, ln in ivs]
    df = spark.createDataFrame(rows, "k long, s long, e long")
    got = {
        r.k: (r.peak_concurrency, r.first_peak)
        for r in peak_concurrency(df, "k", "s", "e", n_buckets=n_buckets).collect()
    }
    for key in {k for k, _, _ in ivs}:
        own = [(s, e) for k, s, e in rows if k == key]
        # brute force: evaluate open-interval count at every start point
        best, best_t = 0, None
        for t in sorted({s for s, _ in own}):
            c = sum(1 for s, e in own if s <= t < e)
            if c > best:
                best, best_t = c, t
        assert got[key] == (best, best_t)


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(data=st.data())
def test_interval_coverage_matches_brute_force(spark, data):
    from kompactor_spark.operators.sweepline import interval_coverage

    ivs = data.draw(
        st.lists(
            st.tuples(st.integers(0, 2), st.integers(0, 100), st.integers(1, 40)),
            min_size=1,
            max_size=30,
        )
    )
    # round 13: coverage is a telescoping sum over the prefix max —
    # the result must be invariant across the serial per-key shape
    # (None, the default) and every bucket grain (1 = degenerate, 3 =
    # islands straddle bucket edges, 64 = the low-cardinality default)
    n_buckets = data.draw(st.sampled_from([None, 1, 3, 64]))
    rows = [(i, k, s, s + ln) for i, (k, s, ln) in enumerate(ivs)]
    df = spark.createDataFrame(rows, "tb long, k long, s long, e long")
    got = {
        r.k: (r.n_islands, r.covered)
        for r in interval_coverage(df, "k", "s", "e", "tb", n_buckets=n_buckets).collect()
    }
    for key in {k for k, _, _ in ivs}:
        own = sorted((s, e) for _, k, s, e in rows if k == key)
        # brute force: merge sorted intervals
        merged = []
        for s, e in own:
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        assert got[key] == (len(merged), sum(e - s for s, e in merged))


# --------------------------------------------------------------------------
# Weighted median ≡ brute force: the cumulative-weight window cut must
# pick the first value (in (value, tiebreak) order) at which twice the
# running weight reaches the group total — for ANY weights including
# ties on the value column and weight-1 degenerate groups.
# --------------------------------------------------------------------------
@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(data=st.data())
def test_weighted_median_matches_brute_force(spark, data):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = data.draw(
        st.lists(
            st.tuples(st.integers(0, 1), st.integers(0, 50), st.integers(1, 20)),
            min_size=1,
            max_size=40,
        )
    )
    df = spark.createDataFrame(
        [(i, g, float(v), w) for i, (g, v, w) in enumerate(rows)],
        "tb long, g long, v double, w long",
    )
    win = (
        Window.partitionBy("g").orderBy("v", "tb").rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("g")
    c = df.select(
        "g", "v", F.sum("w").over(win).alias("cw"), F.sum("w").over(wall).alias("tw")
    )
    got = {
        r.g: r.wm
        for r in c.groupBy("g")
        .agg(F.min(F.when(F.col("cw") * 2 >= F.col("tw"), F.col("v"))).alias("wm"))
        .collect()
    }
    for g in {g for g, _, _ in rows}:
        own = sorted((v, i, w) for i, (gg, v, w) in enumerate(rows) if gg == g)
        total = sum(w for _, _, w in own)
        run = 0
        for v, _, w in own:
            run += w
            if run * 2 >= total:
                assert got[g] == float(v)
                break


# --------------------------------------------------------------------------
# Targeted order-statistics quantiles ≡ F.percentile, bit-for-bit, for
# ANY value multiset (duplicates, negatives, subnormal-ish magnitudes)
# and ANY probability list — the property that caught the interpolation
# formula being an ulp off (symmetric (hi-pos)*lo + (pos-lo)*hi vs
# lo + frac*(hi-lo)). Grouped variant checked on the same draw.
# --------------------------------------------------------------------------
@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(data=st.data())
def test_exact_quantiles_match_percentile_property(spark, data):
    import struct

    from pyspark.sql import functions as F

    from kompactor_spark.operators.quantiles import (
        exact_quantiles,
        grouped_exact_quantiles,
    )

    vals = data.draw(
        st.lists(
            st.one_of(
                st.integers(-1000, 1000).map(lambda i: i / 7.0),
                st.floats(
                    min_value=-1e6,
                    max_value=1e6,
                    allow_nan=False,
                    allow_infinity=False,
                ),
            ),
            min_size=1,
            max_size=200,
        )
    )
    probs = sorted(
        data.draw(
            st.lists(
                st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
                min_size=1,
                max_size=5,
                unique=True,
            )
        )
    )
    groups = data.draw(st.integers(1, 3))
    df = spark.createDataFrame(
        [(i % groups, float(v)) for i, v in enumerate(vals)], "g long, v double"
    )

    def bits(x):
        return struct.pack("<d", float(x)).hex()

    arr = ", ".join(repr(p) for p in probs)
    # global — tiny num_bins/task_cap force the refinement recursion
    # through multiple levels even on small draws (round-6 API)
    cuts, _ = exact_quantiles(df, "v", probs, num_bins=4, task_cap=8, max_levels=12)
    ref = df.agg(F.expr(f"percentile(v, array({arr}))")).collect()[0][0]
    assert [bits(c) for c in cuts] == [bits(r) for r in ref]
    # grouped
    got = {
        r.g: [r[f"p{i}"] for i in range(len(probs))]
        for r in grouped_exact_quantiles(
            df, ["g"], "v", {f"p{i}": p for i, p in enumerate(probs)}, num_partitions=5
        ).collect()
    }
    gref = {
        r.g: r.cs
        for r in df.groupBy("g")
        .agg(F.expr(f"percentile(v, array({arr}))").alias("cs"))
        .collect()
    }
    assert set(got) == set(gref)
    for g in gref:
        assert [bits(x) for x in got[g]] == [bits(x) for x in gref[g]]


# --------------------------------------------------------------------------
# Degree-oriented triangle enumeration ≡ brute force, for ANY simple
# undirected graph — including skewed stars (where the orientation
# matters most), multi-component graphs, and triangle-free graphs. Each
# triangle must appear EXACTLY once (as an unordered corner set), which
# is the invariant the (degree, id) total order guarantees.
# --------------------------------------------------------------------------
@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(data=st.data())
def test_oriented_triangles_match_brute_force(spark, data):
    from itertools import combinations

    from kompactor_spark.queries.graph import _oriented_triangles_from

    n = data.draw(st.integers(3, 12))
    all_pairs = list(combinations(range(n), 2))
    edges = data.draw(
        st.lists(st.sampled_from(all_pairs), min_size=1, max_size=30, unique=True)
    )
    # bias one draw toward a star + rim so a high-degree hub exists
    if data.draw(st.booleans()):
        hub = [(0, i) for i in range(1, n)]
        edges = sorted(set(edges) | set(hub))
    e = spark.createDataFrame([(u, v) for u, v in edges], "u long, v long")
    got = [tuple(sorted((r.a, r.b, r.c))) for r in _oriented_triangles_from(e).collect()]
    eset = set(edges)
    expected = [
        (x, y, z)
        for x, y, z in combinations(range(n), 3)
        if (x, y) in eset and (x, z) in eset and (y, z) in eset
    ]
    assert sorted(got) == sorted(expected)  # exactly-once, not just set-equal


def test_sweepline_auto_dispatch_picks_lane_by_cardinality(spark):
    """VERDICT r13 #5: n_buckets="auto" must route low-cardinality keys
    to the bucketed lane and high-cardinality keys to the serial lane
    (where the bucket machinery is measured pure overhead: 4.47 s vs
    2.00 s at ~1500 keys), and both dispatches must agree with an
    explicit-lane call on the same data."""
    from kompactor_spark.operators import sweepline as SW

    threshold = max(64, 4 * spark.sparkContext.defaultParallelism)
    lo = spark.createDataFrame(
        [(i % 3, 10 * i, 10 * i + 15) for i in range(60)], "k long, s long, e long"
    )
    hi_n = 4 * threshold
    hi = spark.createDataFrame(
        [(i, 10 * (i % 7), 10 * (i % 7) + 25) for i in range(hi_n)],
        "k long, s long, e long",
    )
    assert SW._auto_lane(lo, "k") == SW._AUTO_BUCKETS
    assert SW._auto_lane(hi, "k") is None

    # both ends of the dispatch agree with the explicit lanes
    auto_lo = {
        r.k: (r.peak_concurrency, r.first_peak)
        for r in SW.peak_concurrency(lo, "k", "s", "e").collect()
    }
    bucketed_lo = {
        r.k: (r.peak_concurrency, r.first_peak)
        for r in SW.peak_concurrency(lo, "k", "s", "e", n_buckets=64).collect()
    }
    assert auto_lo == bucketed_lo
    auto_hi = {
        r.k: (r.peak_concurrency, r.first_peak)
        for r in SW.peak_concurrency(hi, "k", "s", "e").collect()
    }
    serial_hi = {
        r.k: (r.peak_concurrency, r.first_peak)
        for r in SW.peak_concurrency(hi, "k", "s", "e", n_buckets=None).collect()
    }
    assert auto_hi == serial_hi and len(auto_hi) == hi_n

    # interval_coverage honors the same "auto" spelling
    cov_auto = {
        r.k: (r.n_islands, r.covered)
        for r in SW.interval_coverage(lo, "k", "s", "e", "s", n_buckets="auto").collect()
    }
    cov_serial = {
        r.k: (r.n_islands, r.covered)
        for r in SW.interval_coverage(lo, "k", "s", "e", "s", n_buckets=None).collect()
    }
    assert cov_auto == cov_serial
