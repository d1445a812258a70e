"""Perf smoke sweep: every registered query once at 10× the grading
scale (benchdata/sf1), wall-clock recorded, slowest first.

Correctness runs at sf0.01; this sweep exists to catch SCALE
pathologies the grading scale hides — a plan that silently collapses to
one core, an accidental cartesian, an expansion join mis-sized by AQE
(the class that made j14 run 2 tasks wide before round 4). Any query
whose sf1 time is wildly out of family with its shape gets a plan
audit. Writes scripts/perf_smoke_out.json; prints the slowest 25.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchdata", "sf1")

# Previously skipped: pyspark.ml's approxSimilarityJoin could pick a
# driver-breaking broadcast for its under-estimated exploded hash side
# at sf1. The SHUFFLE_MERGE hint on the feature frame now pins that
# join to sort-merge (operators/dedup.py::minhash_lsh_pairs,
# plan-pinned in tests/test_plans.py), so the wrapper is sweep-safe
# and IS swept — its sf1 row doubles as the fix's scale evidence.
SKIP: dict[str, str] = {}


def main() -> None:
    from kompactor_spark.queries import all_queries
    from kompactor_spark.session import get_spark

    spark = get_spark("perf-smoke")
    regs = all_queries()
    # Subset-rerun mode (mirrors bench_sf1.py): exact query names as
    # argv; results MERGE into the existing perf_smoke_out.json so a
    # touched-query re-sweep never clobbers the full-sweep record.
    # ADVICE r6 hygiene: keys no longer in the registry are DROPPED on
    # merge (renamed/removed queries don't linger forever), and every
    # entry is stamped with its sweep time so the worst-25 summary — an
    # intentional mix of sweeps in subset mode — is auditable per row.
    subset = set(sys.argv[1:])
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "perf_smoke_out.json")
    out: dict[str, dict] = {}
    if subset and os.path.exists(out_path):
        with open(out_path) as f:
            out = {k: v for k, v in json.load(f).items() if k in regs}
    sweep_ts = time.strftime("%Y-%m-%dT%H:%M:%S")
    for name, fn in sorted(regs.items()):
        if subset and name not in subset:
            continue
        if name in SKIP:
            out[name] = {"skipped": SKIP[name], "swept": sweep_ts}
            print(f"{out[name]}  {name}", flush=True)
            continue
        t0 = time.perf_counter()
        try:
            df = fn(spark, DST)
            n = df.count()
            out[name] = {"sec": round(time.perf_counter() - t0, 2), "rows": n, "swept": sweep_ts}
        except Exception as exc:
            out[name] = {
                "sec": round(time.perf_counter() - t0, 2),
                "error": repr(exc)[:200],
                "swept": sweep_ts,
            }
        print(f"{out[name]}  {name}", flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    worst = sorted(
        (v["sec"], k) for k, v in out.items() if isinstance(v, dict) and "sec" in v
    )[-25:]
    print("\nSLOWEST 25 at sf1 (sweep time per row in the json):")
    for sec, k in reversed(worst):
        print(f"  {sec:8.2f}s  {k}  (swept {out[k].get('swept', '?')})")
    spark.stop()


if __name__ == "__main__":
    main()
