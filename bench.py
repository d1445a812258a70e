"""Benchmark harness (SURVEY §5.4): headline queries at $SPARK_GRAFT_SF_DIR
(default sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints the full artifact JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
followed by a compact headline-only JSON line (the LAST line of stdout,
always <2 KB, so the driver's tail capture carries the primary metric
whole — VERDICT r12 #1; BENCH_r12 lost its 14-row primary to truncation).
The full artifact is also persisted to scripts/bench_out_latest.json.

Protocol mirrors BASELINE.md §2: warm session (startup excluded), one
warm-up run per query, then median of 3 timed action-to-completion runs.
The timed action is a FULL materialization to pandas (``toPandas()``),
matching the oracle baseline's "full result fetch" — a bare ``count()``
lets Catalyst drop final sorts and unused projections, biasing the
comparison (ADVICE r3).

Each query is wrapped in try/except: one failing query records an error
row but can never zero out the round's bench artifact (BENCH_r02 died
mid-run and published nothing — never again).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kompactor_spark.queries import all_queries  # noqa: E402
from kompactor_spark.session import get_spark  # noqa: E402

# Headline set — 1:1 with the BASELINE.md §2 measured query list
# (k_compact_events = Q-compact is timed separately below).
HEADLINE = [
    "a1_groupby_q1",        # Q-agg
    "j9_star_join",         # Q-join3 (superset: 5-table star)
    "w1_ranking",           # Q-window
    "o2_topk",              # Q-topk
    "a2_count_distinct",    # Q-distinct
    "a4_rollup",            # Q-rollup
    "u3_intersect",         # Q-setop
    "f7_json_extract",      # Q-json+time
    "l1_exact_dedup",       # Q-dedup
    "l3_cosine_topk",       # Q-simsearch
    "l4_token_freq",        # Q-tokens
    "j8_asof_join",         # asof temporal join (no DuckDB twin metric)
    "j14_binned_interval_join",  # Q-rangejoin (1.4M pairs at sf0.1)
    "l4_bm25",              # Q-bm25
    "l4_repeated_ngrams",   # Q-ngramdup
    "g3_pagerank",          # Q-pagerank (iterative; round-4 addition)
]
RUNS = 3

# Queries whose *construction* performs real engine work: a driver-side
# lookup of the query vector (l3_cosine_topk), or localCheckpoint calls
# (bm25, pagerank) — Spark 4.1 launches the checkpoint job at call time
# even with eager=False (verified via statusTracker). Excluding
# construction would exclude actual compute from the timed region, so
# for these it stays inside the timer.
EAGER_CONSTRUCT = {"l3_cosine_topk", "l4_bm25", "g3_pagerank"}

# Table-sized results (1.4M pairs at sf0.1): materialize to a Parquet
# sink instead of toPandas — the Arrow->Python transfer of millions of
# rows would otherwise be ~85% of the measured time (see
# scripts/bench_sf1.py LARGE_RESULT for the full rationale; the
# matching DuckDB COPY-to-Parquet number is in BASELINE.md §3).
LARGE_RESULT = {"j14_binned_interval_join"}

# --- sf1 matched section (round 11, VERDICT r10 #3) -------------------
# The sf0.1 rows are all sub-second engine-side, so with the
# same-window control in place they measure Spark's fixed ~0.1-0.3 s
# job floor, not any plan (BASELINE.md §3/§6: "only multi-second rows
# support round-over-round comparison"). The HEADLINE metric is
# therefore this sf1 matched set — rows picked so at least one side
# does multi-second work at sf1 — measured interleaved with the DuckDB
# control in the same window; the sf0.1 suite stays below as the
# floor-calibration appendix. Data = benchdata/sf1 (deterministic 10x
# replication of the driver's sf0.1 testdata; regenerated on the fly if
# the gitignored benchdata/ was purged).
# Round-12 composition (VERDICT r11 #3): >=10 matched rows spanning
# agg/join/text/graph/clustering/dedup/ANN where no single query is
# >30% of either engine or control total (the r11 set was 5 rows with
# g3 ~40% of both). Selection measured in scripts/sf1_candidates_ab.py
# (interleaved same-window); the binding constraint is DuckDB-side
# mass: g3's ~12 s control requires a >=41 s control total, hence both
# iterative heavies (g3, l7g) plus the mid rows. Ordered so a budget
# skip drops the smallest rows last. Protocol pinned in BASELINE.md §4.1.
SF1_MATCHED = [
    "g3_pagerank",                # iterative: DuckDB recursive-CTE side ~12 s
    "l7g_pca_power",              # covariance + 8 power iterations (~10 s control)
    "j19_nearest_value_join",     # binned nearest-value join, sink both sides
    "m11_basket_lift",            # basket co-occurrence lift
    "j14_binned_interval_join",   # 14M-pair range join, sink both sides
    "l4_crossdoc_ngram_share",    # cross-doc n-gram attribution
    "l2_dedup_clusters_collapsed",  # near-dup clusters (collapse-first kernel)
    "l3i_ivf_pq_topk",            # IVF+PQ ANN over embeddings
    "a25_weighted_median",        # weighted median (engine-win agg)
    "x23_max_concurrency",        # sweep-line over 1M events
    "w8_journey_paths",           # per-user ordered journey windows
    "l4_surprisal",               # full-corpus token surprisal
    "l2_containment_collapsed",   # shingle containment (collapsed)
    "l4_repeated_ngrams",         # within-doc n-gram duplication
]
SF1_EAGER_CONSTRUCT = {
    "g3_pagerank",
    "l7g_pca_power",
    "m11_basket_lift",
    "l4_crossdoc_ngram_share",
    "l2_dedup_clusters_collapsed",
    "l2_containment_collapsed",
}
SF1_LARGE_RESULT = {"j14_binned_interval_join", "j19_nearest_value_join"}
# Soft wall-clock budget for the whole sf1 section: the driver runs
# bench.py under a timeout, and a killed process publishes NO JSON line
# at all — so the section is hard-capped here and any rows skipped on
# budget are listed in the output (no silent caps). The round-12
# 14-row set measured ~330 s/section (engine ~40 s + control ~41 s per
# round x 4) and 420 s left headroom for one ambient-band slowdown —
# but the round-14 session's VM runs the DuckDB recursive-CTE controls
# ~2.5x slower than round 13's (g3 control 23-24 s standalone vs
# ~11.8 s in BENCH_r13; engine side only ~1.25x slower), and the
# unchanged 420 s cap skipped HALF the matched set in the round-14
# baseline window (7/14 rows, composition_rule_held=false — recorded in
# OPTIMIZATION_r14.md). The default is resized to what the measured
# worst window actually needs (~800 s), and it scales with the core
# count because the driver re-runs the bench at LOWER core counts to
# measure scaling — the engine side slows roughly with 32/N while the
# budget guarded a 32-core pace. Heavy informative rows stay first so
# any residual skip degrades the composition, never the artifact. The
# wider sf1 set (containment pairs, minhash) stays in
# scripts/bench_sf1.py / BENCH_SF1.json.
try:
    _CPUS = float(os.environ.get("SPARK_GRAFT_CPUS", "32"))
except ValueError:  # e.g. unset-> "*" local wildcard
    _CPUS = 32.0
SF1_BUDGET_SEC = float(
    os.environ.get("SPARK_GRAFT_SF1_BUDGET", "")
    or min(900.0 * max(1.0, 32.0 / max(_CPUS, 1.0)), 2400.0)
)


def _time_full(spark, fn, sf_dir: str) -> float:
    t0 = time.perf_counter()
    pdf = fn(spark, sf_dir).toPandas()
    assert len(pdf) >= 0
    return time.perf_counter() - t0


def _time_sink(spark, fn, sf_dir: str) -> float:
    import shutil
    import tempfile

    df = fn(spark, sf_dir)  # py4j construction — untimed
    sink = os.path.join(tempfile.gettempdir(), "kompactor_bench_sink.parquet")
    t0 = time.perf_counter()
    df.write.mode("overwrite").parquet(sink)
    dt = time.perf_counter() - t0
    shutil.rmtree(sink, ignore_errors=True)
    return dt


def _time_query(spark, fn, sf_dir: str) -> float:
    # Build a FRESH DataFrame for every run, but OUTSIDE the timed
    # region: construction is O(expression count) py4j round-trips
    # (~0.7 s for the wide plans) — client-binding chatter independent
    # of data volume. A fresh plan per run is mandatory: re-executing
    # the *same* DataFrame lets AQE reuse its materialized shuffle
    # stages (measured: j9 0.75 s fresh vs 0.06 s reused), which would
    # silently exclude every exchange from the timing. The timed region
    # is the full JVM pipeline: analysis -> optimize -> codegen ->
    # execute -> Arrow fetch to pandas (same work as the oracle .df()).
    df = fn(spark, sf_dir)
    t0 = time.perf_counter()
    pdf = df.toPandas()
    assert len(pdf) >= 0
    return time.perf_counter() - t0


def _time_compact(spark, sf_dir: str) -> float:
    """BASELINE.md Q-compact mirror: read events → ORDER BY ts → single
    zstd Parquet with bounded row groups (the reference's entire data
    plane, kompactor.ts:107-111)."""
    from kompactor_spark.sources import clear_scratch, write_sorted_single_file
    from kompactor_spark.tables import load_table

    out = clear_scratch("bench_compact_events")
    ev = load_table(spark, sf_dir, "events")
    t0 = time.perf_counter()
    write_sorted_single_file(ev, out, sort_col="ts")
    return time.perf_counter() - t0


def _time_compact_multifile(spark, sf_dir: str) -> float:
    """S6 counterpart (scale-safe shape): same input, range-partitioned
    multi-file sorted sink — no single-writer bottleneck, published next
    to k_compact_events so the single-file number has its scale-correct
    twin on record (VERDICT r3 #6)."""
    from kompactor_spark.sources import clear_scratch, write_range_sorted
    from kompactor_spark.tables import load_table

    out = clear_scratch("bench_compact_events_multifile")
    ev = load_table(spark, sf_dir, "events")
    t0 = time.perf_counter()
    write_range_sorted(ev, out, sort_col="ts", num_files=8)
    return time.perf_counter() - t0


def _bench_one(label, thunk, per_query, errors, duck_thunk=None, duck_control=None):
    """Time one query; when a DuckDB control thunk is given, the runs
    are INTERLEAVED (S,D,S,D,...) in the same session so this VM's
    documented 2-6x ambient swings hit both engines equally — the
    published ratio self-normalizes instead of comparing against a
    DuckDB number from a different window days earlier (VERDICT r9 #3)."""
    try:
        thunk()  # warm-up (parquet footer cache, codegen)
        if duck_thunk is None:
            per_query[label] = round(statistics.median(thunk() for _ in range(RUNS)), 4)
            return
        duck_thunk()  # control warm-up
        s_times, d_times = [], []
        for _ in range(RUNS):
            s_times.append(thunk())
            d_times.append(duck_thunk())
        per_query[label] = round(statistics.median(s_times), 4)
        duck_control[label] = round(statistics.median(d_times), 4)
    except Exception:
        errors[label] = traceback.format_exc().splitlines()[-1]
        print(f"bench: {label} FAILED: {errors[label]}", file=sys.stderr)


def _duck_connect(sf_dir: str):
    """Same-window DuckDB control session: BASELINE.md §2 configuration
    (threads=4 matching the reference's instance option, in-memory,
    views over the same parquet)."""
    import duckdb

    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET threads=4")
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        path = os.path.join(sf_dir, f"{t}.parquet")
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    return con


def _duck_fetch_timer(con, sql: str):
    def run() -> float:
        t0 = time.perf_counter()
        assert len(con.execute(sql).df()) >= 0
        return time.perf_counter() - t0

    return run


def _duck_copy_timer(con, sql: str, options: str = "FORMAT PARQUET"):
    import tempfile

    sink = os.path.join(tempfile.gettempdir(), "kompactor_bench_sink_duck.parquet")

    def run() -> float:
        t0 = time.perf_counter()
        con.execute(f"COPY ({sql}) TO '{sink}' ({options})")
        dt = time.perf_counter() - t0
        if os.path.exists(sink):
            os.remove(sink)
        return dt

    return run


def _sf1_section(spark, regs, oracles):
    """Run the sf1 matched set interleaved with its DuckDB control.
    Returns (per_query, control, skipped, errors) — or None if the sf1
    data can't be made available (bench then publishes sf0.1-only, as
    before round 11)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_sf1",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts", "bench_sf1.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.generate()  # no-op when benchdata/sf1 already exists
    sf1_dir = mod.DST
    # budget clock starts AFTER data generation: a purged benchdata/
    # would otherwise eat the row budget with a one-off regeneration
    # and silently shrink the matched set (the composition rule in
    # BASELINE.md §4.1 assumes all 14 rows run)
    t_section = time.perf_counter()

    duck = _duck_connect(sf1_dir)
    per_query: dict[str, float] = {}
    control: dict[str, float] = {}
    errors: dict[str, str] = {}
    skipped: list[str] = []
    for name in SF1_MATCHED:
        if time.perf_counter() - t_section > SF1_BUDGET_SEC:
            skipped.append(name)
            continue
        fn = regs[name]
        if name in SF1_LARGE_RESULT:
            thunk = lambda fn=fn: _time_sink(spark, fn, sf1_dir)  # noqa: E731
            ctl = _duck_copy_timer(duck, oracles[name])
        elif name in SF1_EAGER_CONSTRUCT:
            thunk = lambda fn=fn: _time_full(spark, fn, sf1_dir)  # noqa: E731
            ctl = _duck_fetch_timer(duck, oracles[name])
        else:
            thunk = lambda fn=fn: _time_query(spark, fn, sf1_dir)  # noqa: E731
            ctl = _duck_fetch_timer(duck, oracles[name])
        _bench_one(name, thunk, per_query, errors, ctl, control)
    duck.close()
    return per_query, control, skipped, errors


def _run_sf01_suite(spark, regs, oracles, sf_dir, warmup: bool):
    """One full sf0.1 window: every HEADLINE row + the two compaction
    rows, engine and DuckDB control interleaved. Extracted round 14 so
    the appendix can run TWICE per bench session (first and last act,
    VERDICT r13 #4): one window per round left ambient drift vs real
    regression as a prose argument; the start/end pair brackets the
    session's drift with data."""
    names = [n for n in HEADLINE if n in regs]
    try:
        duck = _duck_connect(sf_dir)
    except Exception:
        duck = None
        print("bench: DuckDB control unavailable, publishing engine-only", file=sys.stderr)

    if warmup:
        # Global JIT warm-up (see scripts/bench_sf1.py): one untimed pass
        # of every query so the first timed query doesn't pay C2
        # compilation of the shared scan/agg/shuffle paths.
        for name in names:
            try:
                regs[name](spark, sf_dir).toPandas()
            except Exception:
                pass

    per_query: dict[str, float] = {}
    duck_control: dict[str, float] = {}
    errors: dict[str, str] = {}

    def control_for(name):
        """DuckDB control thunk for a headline row, or None (rows-only
        contract rows keep publishing engine-only)."""
        if duck is None or name not in oracles:
            return None
        if name in LARGE_RESULT:
            return _duck_copy_timer(duck, oracles[name])
        return _duck_fetch_timer(duck, oracles[name])

    for name in names:
        # Construct the DataFrame ONCE per query (prepared-statement
        # protocol): Python-side plan construction is O(expression count)
        # py4j round-trips (~0.7 s for a1/j9) — a CLIENT-library constant
        # that neither grows with data (same 0.7 s at sf0.001 and sf1000)
        # nor exists on a reused plan, so timing it per-run measures the
        # Python binding, not the engine. Each timed run still does full
        # analysis->optimize->execute->Arrow-fetch on the JVM side;
        # nothing is cached or persisted between runs (no .persist/
        # .cache anywhere in the timed path).
        fn = regs[name]
        ctl = control_for(name)
        if name in LARGE_RESULT:
            _bench_one(
                name, lambda fn=fn: _time_sink(spark, fn, sf_dir), per_query, errors, ctl, duck_control
            )
            continue
        if name in EAGER_CONSTRUCT:
            # construction does real engine work here — keep it timed
            _bench_one(
                name,
                lambda fn=fn: _time_full(spark, fn, sf_dir),
                per_query,
                errors,
                ctl,
                duck_control,
            )
            continue
        _bench_one(
            name, lambda fn=fn: _time_query(spark, fn, sf_dir), per_query, errors, ctl, duck_control
        )

    # k_compact control = the reference's entire data plane re-expressed
    # in DuckDB (kompactor.ts:107-111): read -> ORDER BY ts -> single
    # zstd parquet with the reference's 100k row groups.
    compact_ctl = (
        _duck_copy_timer(
            duck,
            "SELECT * FROM events ORDER BY ts",
            "FORMAT PARQUET, COMPRESSION ZSTD, ROW_GROUP_SIZE 100000",
        )
        if duck is not None
        else None
    )
    _bench_one(
        "k_compact_events",
        lambda: _time_compact(spark, sf_dir),
        per_query,
        errors,
        compact_ctl,
        duck_control,
    )
    # no DuckDB twin for the range-partitioned multi-file form (DuckDB
    # has no ordered multi-file COPY); published engine-only
    _bench_one(
        "k_compact_events_multifile",
        lambda: _time_compact_multifile(spark, sf_dir),
        per_query,
        errors,
    )
    if duck is not None:
        duck.close()
    return per_query, duck_control, errors


def _sf01_section(per_query, duck_control):
    # sf0.1 suite — the floor-calibration appendix since round 11
    # (VERDICT r10 #3: every matched sf0.1 row is sub-second engine-side
    # where the ~0.1-0.3 s per-job floor dominates; it stays measured for
    # round-over-round trend reading, but no longer leads the artifact).
    sf01 = {
        "total_median_sec": round(sum(per_query.values()), 4),
        "queries": per_query,
        # r4 protocol change (ADVICE r3): full toPandas materialization is
        # timed, not count() — count() let Catalyst skip aggregate values
        # and final sorts, understating engine times ~2x vs the oracle's
        # full-fetch baseline. r4+ totals are NOT comparable to r1-r3.
        # Second r4 change: fresh DataFrame per run (no AQE shuffle-stage
        # reuse possible) with Python-side construction outside the timed
        # region — see _time_query for both rationales.
        "protocol": "full pandas materialization, fresh plan per run, py4j construction untimed (BASELINE.md §3); not comparable to count()-based BENCH_r01-r03",
    }
    if duck_control:
        matched = [n for n in per_query if n in duck_control]
        s_sum = sum(per_query[n] for n in matched)
        d_sum = sum(duck_control[n] for n in matched)
        sf01["duckdb_control"] = duck_control
        sf01["same_window_ratio"] = round(s_sum / d_sum, 3) if d_sum else None
        sf01["control_matched_queries"] = len(matched)
    return sf01


def main() -> None:
    t_session = time.perf_counter()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark("kompactor-spark-bench")
    regs = all_queries()

    from kompactor_spark.queries import all_oracles

    oracles = all_oracles()

    # Appendix window 1 — FIRST act of the session (VERDICT r13 #4).
    per_query, duck_control, errors = _run_sf01_suite(
        spark, regs, oracles, sf_dir, warmup=True
    )
    sf01 = _sf01_section(per_query, duck_control)

    # sf1 matched section — the headline since round 11. Only attempted
    # on the default grading dir (a custom SPARK_GRAFT_SF_DIR keeps the
    # classic single-scale behavior).
    sf1_res = None
    if abs(sf - 0.1) < 1e-9:
        try:
            sf1_res = _sf1_section(spark, regs, oracles)
        except Exception:
            print(
                "bench: sf1 section unavailable: "
                + traceback.format_exc().splitlines()[-1],
                file=sys.stderr,
            )

    if sf1_res is not None:
        # Appendix window 2 — LAST act of the session (VERDICT r13 #4):
        # re-run the identical sf0.1 suite so the artifact carries a
        # start/end ratio PAIR. Cross-round appendix comparisons read
        # the pair's spread as the session's ambient band instead of
        # arguing drift vs regression from one point (round 13: 3.40x
        # mid-round vs 3.88x end-of-round on one unchanged tree).
        # Session-deadline guard (round 14): the second window is the
        # only OPTIONAL section — a driver-side timeout killing the
        # process publishes NOTHING, so when the session is already past
        # the deadline (slow-VM window + the resized sf1 budget), skip
        # w2 with a note instead of risking the whole artifact.
        _deadline = float(
            os.environ.get("SPARK_GRAFT_BENCH_DEADLINE", "")
            or min(1500.0 * max(1.0, 32.0 / max(_CPUS, 1.0)), 3600.0)
        )
        if time.perf_counter() - t_session > _deadline:
            sf01["second_window_skipped"] = (
                f"session past deadline ({_deadline:.0f}s) before window 2; "
                "w1 published alone to protect the artifact from the "
                "driver's process timeout"
            )
        try:
            if "second_window_skipped" in sf01:
                raise RuntimeError(sf01["second_window_skipped"])
            pq2, dc2, errs2 = _run_sf01_suite(
                spark, regs, oracles, sf_dir, warmup=False
            )
            w2 = _sf01_section(pq2, dc2)
            w2.pop("protocol", None)  # identical to window 1's
            sf01["second_window"] = w2
            sf01["window_protocol"] = (
                "two identical windows per session (first/last act); "
                "spread between same_window_ratio values = ambient drift "
                "bracket for this session (BASELINE.md 4.1, round 14)"
            )
            errors.update({f"sf01w2:{k}": v for k, v in errs2.items()})
        except Exception:
            print(
                "bench: second appendix window unavailable: "
                + traceback.format_exc().splitlines()[-1],
                file=sys.stderr,
            )
        q1, c1, skipped, errs1 = sf1_res
        # namespace sf1 failures: the sets overlap (g3, j14, ...), and a
        # bare-name merge would overwrite the sf0.1 error for the same
        # row, hiding which scale failed (ADVICE r11)
        errors.update({f"sf1:{k}": v for k, v in errs1.items()})
        m1 = [n for n in q1 if n in c1]
        s1 = sum(q1[n] for n in m1)
        d1 = sum(c1[n] for n in m1)
        line = {
            "metric": "sf1_matched_total_median_sec",
            "value": round(s1, 4),
            "unit": "sec",
            "queries": q1,
            "sf": 1.0,
            "duckdb_control": c1,
            # engine/oracle interleaved run-by-run in THE SAME window
            # (VERDICT r9 #3), at a scale where every row does
            # multi-second work on at least one side — the number that
            # can regress for a real reason (VERDICT r10 #3).
            "same_window_ratio": round(s1 / d1, 3) if d1 else None,
            "control_matched_queries": len(m1),
            # BASELINE.md §4.1 composition rule made self-auditing: no
            # single row may exceed 30% of either total. Published so a
            # window where g3's control side drifts over the line is
            # visible in the artifact itself, not just at selection time.
            "max_engine_share": round(max(q1[n] for n in m1) / s1, 3) if m1 and s1 else None,
            "max_control_share": round(max(c1[n] for n in m1) / d1, 3) if m1 and d1 else None,
            "row_notes": {
                # sf1 rows whose ratio is floor/fixed-cost shaped; their
                # design-grade points are the sf10 protocol rows
                "m11_basket_lift": "sf1 is fixed-cost shaped; design grade = sf10 0.90x (BENCH_SF10)",
                "j19_nearest_value_join": "sf1 sink floor-heavy; design grade = sf10 0.50x",
                "l4_surprisal": "DuckDB side sub-0.3s at sf1 (floor); design grade = sf10 1.57x",
                "l2_containment_collapsed": "DuckDB side sub-0.7s at sf1; design grade = sf10 1.82x with a FLAT engine curve",
                "l4_repeated_ngrams": "DuckDB side sub-0.5s at sf1; design grade = sf10 0.61x",
            },
            "protocol": (
                "PRIMARY = sf1 matched set (benchdata/sf1, 10x replication), "
                "interleaved same-window DuckDB control, sink for table-sized "
                "results; sf0.1 suite retained under sf01_appendix for "
                "floor calibration + cross-round trends. Not comparable to "
                "the sf0.1-led BENCH_r01-r10 'value' field, NOR to "
                "BENCH_r11's 5-row primary (round 12 widened the set to 14 "
                "rows per BASELINE.md 4.1 — the ratio moved 0.73->~0.8 by "
                "COMPOSITION, adding floor-shaped engine rows, not by any "
                "query regressing; row-level continuity lives in "
                "BENCH_SF10/BENCH_SF1)."
            ),
            "sf01_appendix": sf01,
        }
        if skipped:
            line["sf1_skipped_on_budget"] = skipped
        # ADVICE r12: the headline ratio must not be readable as a clean
        # 14-row measurement when the window wasn't one — a budget skip,
        # an errored row, or a share past the 30% line all break the
        # BASELINE.md §4.1 composition rule, so say so in the artifact.
        held = (
            not skipped
            and not errs1
            and line["max_engine_share"] is not None
            and line["max_engine_share"] <= 0.30
            and line["max_control_share"] is not None
            and line["max_control_share"] <= 0.30
        )
        line["composition_rule_held"] = held
        if not held:
            line["composition_note"] = (
                "BASELINE.md 4.1 composition rule NOT satisfied in this "
                "window (budget skip, errored row, or a row >30% of a "
                "total): same_window_ratio is not a clean "
                f"{len(SF1_MATCHED)}-row measurement"
            )
    else:
        line = {
            "metric": "headline_suite_total_median_sec",
            "value": sf01["total_median_sec"],
            "unit": "sec",
            "queries": per_query,
            "sf": sf,
            "protocol": sf01["protocol"],
        }
        if duck_control:
            line["duckdb_control"] = sf01["duckdb_control"]
            line["same_window_ratio"] = sf01["same_window_ratio"]
            line["control_matched_queries"] = sf01["control_matched_queries"]
    if errors:
        line["errors"] = errors
    # Publication hardening (VERDICT r12 #1): the driver records only the
    # last ~2 KB of stdout, and BENCH_r12's single giant JSON line had its
    # LEADING primary section truncated away (parsed: null) — the round's
    # headline number never reached the repo. Two fixes, belt and braces:
    #  (a) persist the FULL artifact to scripts/bench_out_latest.json
    #      (committed per-round like every other scripts/*_out.json);
    #  (b) print the full line first, then a compact headline-only line
    #      LAST, sized to always fit the tail capture whole.
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scripts", "bench_out_latest.json"
    )
    try:
        with open(out_path, "w") as fh:
            json.dump(line, fh, indent=1)
            fh.write("\n")
    except OSError as exc:
        print(f"bench: could not persist full artifact: {exc}", file=sys.stderr)
    print(json.dumps(line))
    print(json.dumps(_compact_headline(line)))
    spark.stop()


def _compact_headline(line: dict) -> dict:
    """Headline-only trailing stdout line (VERDICT r12 #1): everything a
    reader needs from the round — metric, value, per-query medians and
    ratios, shares, composition flag — in well under 2 KB so a tail
    capture can never lose it. Full detail precedes it on stdout and is
    persisted at scripts/bench_out_latest.json."""
    compact = {
        "metric": line["metric"],
        "value": line["value"],
        "unit": line.get("unit", "sec"),
        "sf": line["sf"],
        "queries": line.get("queries", {}),
    }
    for k in (
        "same_window_ratio",
        "control_matched_queries",
        "max_engine_share",
        "max_control_share",
        "composition_rule_held",
        "sf1_skipped_on_budget",
    ):
        if k in line and line[k] is not None:
            compact[k] = line[k]
    ctl = line.get("duckdb_control", {})
    if ctl:
        compact["ratios"] = {
            n: round(line["queries"][n] / ctl[n], 2)
            for n in line.get("queries", {})
            if n in ctl and ctl[n]
        }
    app = line.get("sf01_appendix")
    if app:
        compact["sf01_total_sec"] = app.get("total_median_sec")
        compact["sf01_ratio"] = app.get("same_window_ratio")
        w2 = app.get("second_window")
        if w2:
            compact["sf01_ratio_w2"] = w2.get("same_window_ratio")
    if line.get("errors"):
        compact["error_keys"] = sorted(line["errors"])
    compact["full_artifact"] = "scripts/bench_out_latest.json"
    return compact


if __name__ == "__main__":
    main()
