"""Round-15 clean interleaved sf1 window (VERDICT r14 #1).

Four rows straddle or sit near their pre-committed ambient triggers after
the round-14 window (driver PERF_r14): m11_basket_lift 1.77x (trigger
1.8x), x23_max_concurrency 1.81x (trigger 1.8x), plus the two rows the
driver graded "regressed" with zero code touches (j14 0.89x speedup,
l7g 0.71x speedup) — all four attributed to ambient VM drift in
OPTIMIZATION_r14.md / VERDICT r14. The standing rule: drift may not
argue for itself — one fresh-session identity-gated window on UNCHANGED
code either resets the clock (<=1.8x) or fires the pre-committed fix.

Protocol = bench.py sf1 row protocol per row (m11/l7g EAGER construct,
x23 lazy plan + timed toPandas, j14 parquet sink vs DuckDB COPY),
engine/DuckDB interleaved run-by-run, fresh Spark session per window,
two windows. Identity gate: engine output vs DuckDB oracle via
oracle.compare_frames before any timing.

Usage:  python scripts/r15_cleanwindow.py [runs_per_window] [windows]
Writes scripts/r15_cleanwindow_out.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(ROOT, "benchdata", "sf1")
OUT = os.path.join(ROOT, "scripts", "r15_cleanwindow_out.json")

ROWS = [
    # (name, engine_protocol, duck_protocol)
    ("m11_basket_lift", "eager", "fetch"),
    ("x23_max_concurrency", "lazy", "fetch"),
    ("j14_binned_interval_join", "sink", "copy"),
    ("l7g_pca_power", "eager", "fetch"),
]
TRIGGER = 1.8


def _duck_connect(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET threads=4")
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    return con


def window(runs: int, tag: str) -> dict:
    import shutil
    import tempfile

    from kompactor_spark.oracle import compare_frames
    from kompactor_spark.queries import all_oracles, all_queries
    from kompactor_spark.session import get_spark

    spark = get_spark(f"r15-cleanwindow-{tag}")
    regs, oracles = all_queries(), all_oracles()
    con = _duck_connect(SF1)
    sink = os.path.join(tempfile.gettempdir(), "r15_cleanwindow_sink.parquet")
    duck_sink = os.path.join(tempfile.gettempdir(), "r15_cleanwindow_duck.parquet")

    out: dict = {}
    for name, eng_proto, duck_proto in ROWS:
        fn, sql = regs[name], oracles[name]
        spark.sparkContext.setJobDescription(f"r15-cleanwindow:{name}")

        # identity gate (order-insensitive canonical compare, driver's rule)
        cmp = compare_frames(name, fn(spark, SF1).toPandas(), con.execute(sql).df())
        if not cmp.ok:
            raise SystemExit(f"{name}: identity gate FAILED: {cmp.detail} — window void")

        def eng() -> float:
            if eng_proto == "eager":
                t0 = time.perf_counter()
                pdf = fn(spark, SF1).toPandas()
                assert len(pdf) >= 0
                return time.perf_counter() - t0
            if eng_proto == "sink":
                df = fn(spark, SF1)
                t0 = time.perf_counter()
                df.write.mode("overwrite").parquet(sink)
                dt = time.perf_counter() - t0
                shutil.rmtree(sink, ignore_errors=True)
                return dt
            df = fn(spark, SF1)  # lazy: fresh plan, construction untimed
            t0 = time.perf_counter()
            pdf = df.toPandas()
            assert len(pdf) >= 0
            return time.perf_counter() - t0

        def dck() -> float:
            if duck_proto == "copy":
                t0 = time.perf_counter()
                con.execute(f"COPY ({sql}) TO '{duck_sink}' (FORMAT PARQUET)")
                dt = time.perf_counter() - t0
                if os.path.exists(duck_sink):
                    os.remove(duck_sink)
                return dt
            t0 = time.perf_counter()
            assert len(con.execute(sql).df()) >= 0
            return time.perf_counter() - t0

        eng()
        dck()  # warm-ups
        es, ds = [], []
        for _ in range(runs):
            es.append(eng())
            ds.append(dck())
        e, d = statistics.median(es), statistics.median(ds)
        out[name] = {
            "engine_sec": round(e, 3),
            "duckdb_sec": round(d, 3),
            "ratio": round(e / d, 2),
            "trigger_fired": round(e / d, 2) > TRIGGER,
            "engine_runs": [round(x, 3) for x in es],
            "duck_runs": [round(x, 3) for x in ds],
        }
        print(json.dumps({tag: {name: out[name]}}), flush=True)
    con.close()
    spark.stop()
    return out


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_windows = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    head = subprocess.run(
        ["git", "-C", ROOT, "rev-parse", "HEAD"], capture_output=True, text=True
    ).stdout.strip()
    res = {
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "git_head": head,
        "protocol": (
            "fresh-session identity-gated sf1 windows on unchanged round-14 "
            "code (VERDICT r14 #1): engine/DuckDB interleaved run-by-run, "
            "bench.py per-row protocol (m11/l7g eager, x23 lazy, j14 sink "
            "vs COPY). Trigger rule: ratio >1.8x in this clean window fires "
            "the pre-committed fix; <=1.8x resets the two-round clock"
        ),
    }
    for w in range(n_windows):
        res[f"window_{w + 1}"] = window(runs, f"w{w + 1}")
    with open(OUT, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
