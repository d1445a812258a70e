"""Round-14 m11 clean-window confirmation (VERDICT r13 #2).

Round 13 moved m11_basket_lift's pair build onto the guarded Arrow pair
kernel after the two-round rule fired on its sf1 ratio (the old shape's
plan let AQE broadcast the ~6M-row distinct (order, part) side). The
kernel arm's sf1 readings (1.45-1.66x) all came from the builder's own
change-day bench/A-B windows; the standing rule wants one independent
fresh-session window on UNCHANGED code. Done = m11 <=2x here (expected
~1.65x); if >2x, the two-round clock restarts with one strike.

Protocol = bench.py sf1 row protocol for m11 (eager construction, full
pandas fetch), engine/DuckDB interleaved run-by-run, fresh session per
window, two windows.

Usage:  python scripts/r14_remeasure.py [runs_per_window] [windows]
Writes scripts/r14_remeasure_out.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(ROOT, "benchdata", "sf1")
OUT = os.path.join(ROOT, "scripts", "r14_remeasure_out.json")

NAME = "m11_basket_lift"


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


def window(runs: int, tag: str) -> dict:
    from kompactor_spark.queries import all_oracles, all_queries
    from kompactor_spark.session import get_spark

    spark = get_spark(f"r14-remeasure-{tag}")
    fn, sql = all_queries()[NAME], all_oracles()[NAME]
    con = duck_connect(SF1)

    def eng() -> float:
        # eager: construction collects model state / checkpoints — timed
        t0 = time.perf_counter()
        df = fn(spark, SF1)
        pdf = df.toPandas()
        if len(pdf) < 0:
            raise AssertionError("unreachable")
        return time.perf_counter() - t0

    def dck() -> float:
        t0 = time.perf_counter()
        df = con.execute(sql).df()
        if len(df) < 0:
            raise AssertionError("unreachable")
        return time.perf_counter() - t0

    eng()
    dck()  # warm-ups
    es, ds = [], []
    for _ in range(runs):
        es.append(eng())
        ds.append(dck())
    e, d = statistics.median(es), statistics.median(ds)
    out = {
        NAME: {
            "engine_sec": round(e, 3),
            "duckdb_sec": round(d, 3),
            "ratio": round(e / d, 2),
            "engine_runs": [round(x, 2) for x in es],
            "duck_runs": [round(x, 2) for x in ds],
        }
    }
    print(json.dumps({tag: out}), flush=True)
    con.close()
    spark.stop()
    return out


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_windows = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    res = {
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "protocol": (
            "independent post-change windows on unchanged m11 code "
            "(VERDICT r13 #2): fresh session per window, engine/DuckDB "
            "interleaved run-by-run, bench.py sf1 m11 protocol (eager "
            "construction, pandas fetch). Change-day readings for "
            "reference: 1.45-1.66x; sf10 design grade 0.66x; trigger "
            "if >2x: two-round clock restarts with one strike"
        ),
    }
    for w in range(n_windows):
        res[f"window_{w + 1}"] = window(runs, f"w{w + 1}")
    with open(OUT, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
