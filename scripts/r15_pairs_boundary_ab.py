"""Round-15: the deferred containment-kernel boundary A/B (VERDICT r14
#4). The r14 decomposition split l2_containment_collapsed's graded row
into ~0.44 s kernel body + ~0.18 s Python boundary + launch floors; the
named fix is mapInArrow (Arrow in/out, no pandas conversion). The
kernel's numpy core is now shared by both wrappers
(operators/dedup.py: compute() + run/run_arrow), selected by
KOMPACTOR_PAIRS_BOUNDARY at plan-construction time.

Arms interleaved in one session, identity-gated vs the DuckDB oracle
AND byte-compared: A = mapInPandas (shipped default), B = mapInArrow.
Protocol = bench eager construct (l2_containment_collapsed is in
SF1_EAGER_CONSTRUCT).

Usage:  python scripts/r15_pairs_boundary_ab.py [rounds]
Writes scripts/r15_pairs_boundary_ab_out.json and prints one JSON line.
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
OUT = os.path.join(ROOT, "scripts", "r15_pairs_boundary_ab_out.json")

NAME = "l2_containment_collapsed"


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 7

    import duckdb

    from kompactor_spark.oracle import compare_frames
    from kompactor_spark.queries import all_oracles, all_queries
    from kompactor_spark.session import get_spark

    spark = get_spark("r15-pairs-boundary-ab")
    regs, oracles = all_queries(), all_oracles()
    fn, sql = regs[NAME], oracles[NAME]

    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET threads=4")
    p = os.path.join(SF1, "documents.parquet")
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{src}')")

    def build(boundary):
        os.environ["KOMPACTOR_PAIRS_BOUNDARY"] = boundary
        try:
            return fn(spark, SF1)
        finally:
            os.environ.pop("KOMPACTOR_PAIRS_BOUNDARY", None)

    duck_pdf = con.execute(sql).df()
    ref = None
    for arm in ("pandas", "arrow"):
        got = build(arm).toPandas()
        cmp = compare_frames(NAME, got, duck_pdf)
        if not cmp.ok:
            raise SystemExit(f"{arm}: oracle gate FAILED: {cmp.detail}")
        if ref is None:
            ref = got
        elif not got.equals(ref):
            raise SystemExit(f"{arm}: differs from pandas arm — A/B void")
    # plan sanity: the arrow arm must actually plan MapInArrow
    p_arrow = build("arrow")._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in p_arrow, "arrow arm did not plan MapInArrow"
    print("identity gates passed; arrow arm plans MapInArrow", file=sys.stderr)

    def timer(boundary):  # EAGER construct, like the bench row
        t0 = time.perf_counter()
        pdf = build(boundary).toPandas()
        assert len(pdf) >= 0
        return time.perf_counter() - t0

    times = {"pandas": [], "arrow": [], "duck": []}
    timer("pandas")
    timer("arrow")  # warm-ups
    for r in range(rounds):
        spark.sparkContext.setJobDescription(f"r15-boundary:pandas:r{r}")
        times["pandas"].append(timer("pandas"))
        spark.sparkContext.setJobDescription(f"r15-boundary:arrow:r{r}")
        times["arrow"].append(timer("arrow"))
        t0 = time.perf_counter()
        assert len(con.execute(sql).df()) >= 0
        times["duck"].append(time.perf_counter() - t0)

    d = statistics.median(times["duck"])
    res = {
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "rounds": rounds,
        "duck_sec": round(d, 3),
    }
    for arm in ("pandas", "arrow"):
        m = statistics.median(times[arm])
        res[arm] = {
            "median_sec": round(m, 3),
            "ratio": round(m / d, 2),
            "runs": [round(x, 3) for x in times[arm]],
        }
    res["duck_runs"] = [round(x, 3) for x in times["duck"]]
    with open(OUT, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res))
    con.close()
    spark.stop()


if __name__ == "__main__":
    main()
