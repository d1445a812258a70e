"""Round-15 AQE partition-coalescing probe (VERDICT r14 #6, guide §2.2).

The scaling pair (r15_scaling_sf10.py) measures seconds; this probe
records the OTHER half of the verdict item: does AQE keep small-SF task
counts sane, i.e. does the same plan that runs 32-wide at sf10 coalesce
its shuffle reads instead of launching 32 near-empty tasks at sf0.01?

Runs m11_basket_lift (the largest shuffle row in the pair) once per SF,
then dumps the POST-EXECUTION adaptive plan and counts AQEShuffleRead
nodes and their coalesced partition specs.

Usage: python scripts/r15_scaling_aqe_probe.py
Appends one JSON line per SF to scripts/r15_scaling_aqe_probe_out.json.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "scripts", "r15_scaling_aqe_probe_out.json")


def main() -> None:
    from kompactor_spark.queries import all_queries
    from kompactor_spark.session import get_spark

    spark = get_spark("r15-aqe-probe")
    fn = all_queries()["m11_basket_lift"]

    results = []
    for sf_label, sf_dir in [
        ("sf0.01", os.path.join("/root/testdata", "sf0.01")),
        ("sf10", os.path.join(ROOT, "benchdata", "sf10")),
    ]:
        spark.sparkContext.setJobDescription(f"r15-aqe-probe:{sf_label}")
        df = fn(spark, sf_dir)
        df.toPandas()  # execute so the adaptive plan is final
        plan = df._jdf.queryExecution().executedPlan().toString()
        reads = re.findall(r"AQEShuffleRead (\w+)", plan)
        results.append(
            {
                "sf": sf_label,
                "aqe_shuffle_reads": len(reads),
                "coalesced": sum(1 for r in reads if r == "coalesced"),
                "read_specs": reads,
                "exchanges": plan.count("Exchange hashpartitioning"),
            }
        )
        print(json.dumps(results[-1]), flush=True)

    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
