"""Settle a22's two-window sf10 spread (VERDICT r8 #2).

Round 8 recorded 1.63 s (first publication) vs 6.8 s (continuation
window) for a22_equi_depth_histogram at sf10 on identical code — the
suspect was the medium tier's localCheckpoint block store tracking
ambient storage health. This runs the interleaved same-session A/B the
protocol requires:

  A = medium staging "checkpoint" (fan_out + lazy localCheckpoint)
  B = medium staging "rescan"     (fan_out only; every pass re-scans)

alternating per round, plus the DuckDB twin (threads=4) interleaved in
the same window, so all three series share whatever ambient regime the
window has. Prints one JSON line per run and a summary.

Usage:  python scripts/a22_staging_ab.py [rounds=5]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchdata", "sf10"
)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    from kompactor_spark.queries import all_oracles, all_queries
    from kompactor_spark.session import get_spark

    spark = get_spark("a22-staging-ab")
    q = all_queries()["a22_equi_depth_histogram"]

    con = duckdb.connect()

    con.execute("SET temp_directory='/tmp/duckdb_spill'")  # spill outside the repo (ADVICE r9)
    con.execute("SET threads=4")
    for t in "region nation customer supplier part orders lineitem events embeddings".split():
        path = os.path.join(DST, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DST}/documents.parquet/*.parquet')"
    )
    oracle = all_oracles()["a22_equi_depth_histogram"]

    def engine(mode: str) -> float:
        os.environ["KOMPACTOR_QUANTILE_MEDIUM_STAGING"] = mode
        t0 = time.perf_counter()
        df = q(spark, DST)  # a22's jobs start at construction (eager cuts)
        assert len(df.toPandas()) >= 0
        return time.perf_counter() - t0

    def duck() -> float:
        t0 = time.perf_counter()
        con.execute(oracle).df()
        return time.perf_counter() - t0

    # warm all three paths once (JIT + catalog)
    engine("checkpoint"), engine("rescan"), duck()

    series: dict[str, list[float]] = {"checkpoint": [], "rescan": [], "duckdb": []}
    for i in range(rounds):
        for label, fn in (
            ("checkpoint", lambda: engine("checkpoint")),
            ("rescan", lambda: engine("rescan")),
            ("duckdb", duck),
        ):
            dt = fn()
            series[label].append(dt)
            print(json.dumps({"round": i, "plan": label, "sec": round(dt, 3)}), flush=True)
    os.environ.pop("KOMPACTOR_QUANTILE_MEDIUM_STAGING", None)
    summary = {
        k: {"median": round(statistics.median(v), 3), "min": round(min(v), 3),
            "max": round(max(v), 3)}
        for k, v in series.items()
    }
    print(json.dumps({"summary": summary, "rounds": rounds}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
