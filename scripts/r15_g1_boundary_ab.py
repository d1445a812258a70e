"""Round-15: pair-count kernel boundary A/B (the graph/m11 sibling of
the dedup-kernel swap that measured 2.17 -> 1.14 s on containment).

_pair_count_kernel consumed its bucket list column through mapInPandas:
pandas materializes one object ndarray PER BUCKET (1.47M buckets at
m11/sf1). The mapInArrow wrapper reads the Arrow list offsets + flat
values and hands the numpy core zero-copy int64 views. The r13 negative
arm (size-grouped vectorized mapInArrow, scripts/m11_shape_ab_sf10b)
redesigned the EXPANSION — this swap changes ONLY the boundary; the
expansion core is byte-identical.

Arms interleaved in one session via KOMPACTOR_PAIRKERNEL_BOUNDARY
(plan-construction-time env), identity-gated byte-compare, rows:
m11_basket_lift (eager bench protocol, the fired-trigger row) and
g1_cooccurrence_graph (lazy).

Usage:  python scripts/r15_g1_boundary_ab.py [rounds] [sf_dir]
Writes scripts/r15_g1_boundary_ab_out.json and prints one JSON line.
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
OUT = os.path.join(ROOT, "scripts", "r15_g1_boundary_ab_out.json")

ROWS = [("m11_basket_lift", "eager"), ("g1_cooccurrence_graph", "lazy")]


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else SF1

    from kompactor_spark.queries import all_queries
    from kompactor_spark.session import get_spark

    spark = get_spark("r15-g1-boundary-ab")
    regs = all_queries()

    def build(fn, boundary):
        os.environ["KOMPACTOR_PAIRKERNEL_BOUNDARY"] = boundary
        try:
            return fn(spark, sf_dir)
        finally:
            os.environ.pop("KOMPACTOR_PAIRKERNEL_BOUNDARY", None)

    res: dict = {
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "rounds": rounds,
        "sf_dir": sf_dir,
    }
    for name, proto in ROWS:
        fn = regs[name]
        # identity gate: both boundaries byte-identical (g1 output is an
        # unsorted edge list — canonicalize by sorting before compare)
        a = build(fn, "pandas").toPandas()
        b = build(fn, "arrow").toPandas()
        key = list(a.columns)
        a_s = a.sort_values(key).reset_index(drop=True)
        b_s = b.sort_values(key).reset_index(drop=True)
        if not b_s.equals(a_s):
            raise SystemExit(f"{name}: arrow boundary differs — A/B void")
        p = build(fn, "arrow")._jdf.queryExecution().executedPlan().toString()
        assert "MapInArrow" in p, f"{name}: arrow arm did not plan MapInArrow"
        print(f"{name}: identity gate passed", file=sys.stderr)

        def timer(boundary):
            if proto == "eager":
                t0 = time.perf_counter()
                pdf = build(fn, boundary).toPandas()
                assert len(pdf) >= 0
                return time.perf_counter() - t0
            df = build(fn, boundary)
            t0 = time.perf_counter()
            pdf = df.toPandas()
            assert len(pdf) >= 0
            return time.perf_counter() - t0

        times = {"pandas": [], "arrow": []}
        timer("pandas")
        timer("arrow")  # warm-ups
        for r in range(rounds):
            for arm in ("pandas", "arrow"):
                spark.sparkContext.setJobDescription(f"r15-g1b:{name}:{arm}:r{r}")
                times[arm].append(timer(arm))
        entry = {
            arm: {
                "median_sec": round(statistics.median(ts), 3),
                "runs": [round(x, 3) for x in ts],
            }
            for arm, ts in times.items()
        }
        res[name] = entry
        print(json.dumps({name: entry}), flush=True)

    with open(OUT, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
