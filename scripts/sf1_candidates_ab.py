"""sf1 matched-set widening: candidate measurements (VERDICT r11 #3).

The BENCH_rN primary (sf1 matched set) is 5 rows and g3_pagerank is
~40% of both totals — fragile to composition. BENCH_SF1.json's wider
protocol already measures most families, but picking new PRIMARY rows
needs same-window numbers for the rows it does NOT cover: the verdict
asks for >=10 matched rows spanning agg/join/text/graph/compaction
with no single query >30% of either total.

This measures the candidate rows (those with a multi-second side at
sf1 by their sf10 behavior: j19's binned sink, m11's basket lift,
a25's weighted median vs DuckDB's quadratic-ish percentile, crossdoc,
x9, l2 dedup clusters) interleaved vs their oracles in ONE session,
BENCH protocol (fresh plan per run, full fetch; j19 sinks on both
sides). Output feeds the SF1_MATCHED composition in bench.py — the
published numbers remain bench.py's own interleaved runs.

Usage:  python scripts/sf1_candidates_ab.py [runs]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(ROOT, "benchdata", "sf1")

CANDIDATES = [
    "j19_nearest_value_join",
    "m11_basket_lift",
    "a25_weighted_median",
    "l4_crossdoc_ngram_share",
    "x9_interval_join",
    "l2_dedup_clusters_collapsed",
]
EAGER = {"m11_basket_lift", "l4_crossdoc_ngram_share", "l2_dedup_clusters_collapsed"}
SINK = {"j19_nearest_value_join"}


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from kompactor_spark.queries import all_oracles, all_queries
    from kompactor_spark.session import get_spark

    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_sf1", os.path.join(ROOT, "scripts", "bench_sf1.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.generate()

    import duckdb

    con = duckdb.connect()
    con.execute("SET threads=4")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        p = os.path.join(SF1, f"{t}.parquet")
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

    spark = get_spark("sf1-candidates")
    qs, oracles = all_queries(), all_oracles()
    sink = f"/tmp/sf1_cand_sink_{os.getpid()}.parquet"
    out = {}
    for name in CANDIDATES:
        fn, sql = qs[name], oracles[name]

        def eng() -> float:
            if name in EAGER:
                t0 = time.perf_counter()
                df = fn(spark, SF1)
            else:
                df = fn(spark, SF1)
                t0 = time.perf_counter()
            if name in SINK:
                df.write.mode("overwrite").parquet(sink)
                shutil.rmtree(sink, ignore_errors=True)
            else:
                pdf = df.toPandas()
                if len(pdf) < 0:
                    raise AssertionError("unreachable")
            return time.perf_counter() - t0

        def dck() -> float:
            t0 = time.perf_counter()
            if name in SINK:
                dsink = f"/tmp/sf1_cand_duck_{os.getpid()}.parquet"
                con.execute(f"COPY ({sql}) TO '{dsink}' (FORMAT PARQUET)")
                os.remove(dsink)
            else:
                df = con.execute(sql).df()
                if len(df) < 0:
                    raise AssertionError("unreachable")
            return time.perf_counter() - t0

        try:
            eng()
            dck()
            es, ds = [], []
            for _ in range(runs):
                es.append(eng())
                ds.append(dck())
            e, d = statistics.median(es), statistics.median(ds)
            out[name] = {
                "engine_sec": round(e, 3),
                "duckdb_sec": round(d, 3),
                "ratio": round(e / d, 2),
            }
        except Exception as exc:  # record, keep measuring the rest
            out[name] = {"error": f"{type(exc).__name__}: {exc}"}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
