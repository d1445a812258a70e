"""Round-12 protocol re-measurements.

Two jobs in one runner (each chunk = its own fresh session, the
bench-session-hygiene lesson):

1. **Changed-query sf10 protocol rows** (standing invariant: a changed
   implementation re-measures its BENCH_SF10 row interleaved
   same-session). Round 12 changed `_cooccurrence_edges` (NULL-key
   filter + pair-count/flush guards) — every g-row inherits it — and
   the batch cosine kernel (zero-norm drop): g1, g2, g3, g6,
   l3_batch_topk, l7_knn_classify run fully interleaved vs their
   oracles. g5's DuckDB side is 609 s at sf10 and its oracle did not
   change, so g5 re-measures the ENGINE side only (at a 0.09x gap no
   window drift can flip the conclusion — the TREND-table argument);
   g4's ratio comes from scripts/g4_duck_twin.py.

2. **TREND small-scale twins** (VERDICT r11 #5): the round-11 shapes —
   g1's kernel edge build and the strict-assoc assignment kernel
   (l7_kmeans_refine / l7_cluster_purity) — measured same-code at
   benchdata/sf1 (the 1/10 twin) interleaved vs DuckDB, giving the
   TREND table its engine/DuckDB growth factors against the sf10
   endpoints.

Usage:  python scripts/r12_remeasure.py [runs]
Prints one JSON line per row; writes scripts/r12_remeasure_out.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF10 = os.path.join(ROOT, "benchdata", "sf10")
SF1 = os.path.join(ROOT, "benchdata", "sf1")
OUT = os.path.join(ROOT, "scripts", "r12_remeasure_out.json")

# (name, duckdb side?, sink?) — g1 is a LARGE_RESULT sink row
# at sf10 (1M edges); everything else fetches (BENCH_SF10 protocol).
SF10_ROWS = [
    ("g1_cooccurrence_graph", True, True),
    ("g2_degree_centrality", True, False),
    ("g3_pagerank", True, False),
    ("g6_degree_assortativity", True, False),
    ("l3_batch_topk", True, False),
    ("l7_knn_classify", True, False),
    ("g5_neighbor_jaccard", False, False),  # engine-only, see docstring
    ("g4_triangle_count", False, False),  # engine-only, see docstring
]
SF1_TWINS = [
    ("g1_cooccurrence_graph", True, True),
    ("l7_kmeans_refine", True, False),
    ("l7_cluster_purity", True, False),
]
# BENCH_SF10 protocol: construction does real engine work for these
# (localCheckpoint / model-state collects run at call time) — the
# timer keeps construction inside, mirroring scripts/bench_sf10.py.
EAGER = {
    "g3_pagerank",
    "g6_degree_assortativity",
    "l3_batch_topk",
    "l7_knn_classify",
    "l7_kmeans_refine",
    "l7_cluster_purity",
}


def _drop_checkpoint_blocks(spark) -> None:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for jrdd in jmap.values():
        jrdd.unpersist(True)


def duck_connect(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    con.execute("SET threads=4")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    return con


def measure(rows, sf_dir, runs):
    only = os.environ.get("R12_ONLY")
    if only:
        rows = [r for r in rows if r[0] in set(only.split(","))]
    import shutil

    from kompactor_spark.queries import all_oracles, all_queries
    from kompactor_spark.session import get_spark

    spark = get_spark(f"r12-remeasure-{os.path.basename(sf_dir)}")
    qs, oracles = all_queries(), all_oracles()
    con = duck_connect(sf_dir)
    sink = f"/tmp/r12_remeasure_sink_{os.getpid()}.parquet"
    out = {}
    for name, with_duck, use_sink in rows:
        fn, sql = qs[name], oracles[name]

        def eng() -> float:
            if name in EAGER:
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
            else:
                df = fn(spark, sf_dir)
                t0 = time.perf_counter()
            if use_sink:
                df.write.mode("overwrite").parquet(sink)
                shutil.rmtree(sink, ignore_errors=True)
            else:
                pdf = df.toPandas()
                if len(pdf) < 0:
                    raise AssertionError("unreachable")
            dt = time.perf_counter() - t0
            _drop_checkpoint_blocks(spark)
            return dt

        def dck() -> float:
            t0 = time.perf_counter()
            if use_sink:
                dsink = f"/tmp/r12_duck_sink_{os.getpid()}.parquet"
                con.execute(f"COPY ({sql}) TO '{dsink}' (FORMAT PARQUET)")
                os.remove(dsink)
            else:
                df = con.execute(sql).df()
                if len(df) < 0:
                    raise AssertionError("unreachable")
            return time.perf_counter() - t0

        eng()  # warm-up
        if with_duck:
            dck()
        es, ds = [], []
        for _ in range(runs):
            es.append(eng())
            if with_duck:
                ds.append(dck())
        e = statistics.median(es)
        row = {"engine_sec": round(e, 3), "engine_runs": [round(x, 2) for x in es]}
        if with_duck:
            d = statistics.median(ds)
            row["duckdb_sec"] = round(d, 3)
            row["ratio"] = round(e / d, 2)
        out[name] = row
        print(json.dumps({name: row}), flush=True)
    con.close()
    spark.stop()
    return out


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    res = {}
    if which in ("both", "sf10"):
        res["sf10"] = measure(SF10_ROWS, SF10, runs)
    if which in ("both", "sf1"):
        res["sf1_twins"] = measure(SF1_TWINS, SF1, max(runs, 3))
    res["protocol"] = (
        "interleaved same-session per scale chunk, fresh session per chunk, "
        "checkpoint blocks dropped between runs; g5 engine-only (oracle "
        "unchanged, 609 s side), g4 via scripts/g4_duck_twin.py"
    )
    prev = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            prev = json.load(fh)
    for k, v in res.items():
        # merge per-scale row dicts so a subset re-run (R12_ONLY) never
        # drops rows measured earlier
        if isinstance(v, dict) and isinstance(prev.get(k), dict):
            prev[k].update(v)
        else:
            prev[k] = v
    with open(OUT, "w") as fh:
        json.dump(prev, fh, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
