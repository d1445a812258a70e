"""Round-14 plan capture + audit (optimization round, guide §1/§7.2).

Captures ``explain("formatted")`` for every declared-window query plus
the bench surface at sf0.1 into ``plans/r14/<name>_<tag>.txt``, and
emits a one-line-per-query audit: Exchange count (hash/range/single),
join strategies, Python-eval nodes, and the flag this round hunts —
a range exchange whose child subtree contains expensive narrow work
(scan or Python kernel) with no intervening exchange, which Spark
executes TWICE (range-bounds sampling pass + real pass; verified by
accumulator probe this round).

Usage: python scripts/r14_plan_sweep.py <tag> [name ...]
  tag: "before" / "after" — suffix for plans/r14/<name>_<tag>.txt
  names: optional subset; default = declared 50-window + sf1 matched +
         sf0.1 headline.
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
import traceback
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")


def audit(plan: str) -> dict:
    n_ex = len(re.findall(r"\bExchange\b", plan))
    # formatted explain separates the node name from its arguments, so
    # match the partitioning argument lines, not "Exchange rangepart..."
    n_range = len(re.findall(r"rangepartitioning\(", plan))
    n_single = len(re.findall(r"SinglePartition", plan))
    joins = sorted(set(re.findall(r"(\w*Join\w*)", plan)) - {"Join"})
    pyevals = sorted(set(re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInPandas|PythonMapInArrow|FlatMapGroupsInPandas|MapInArrow)", plan)))
    return {
        "exchanges": n_ex,
        "range_exchanges": n_range,
        "single_exchanges": n_single,
        "joins": joins,
        "python_nodes": pyevals,
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
    }


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2:]

    import __spark_entry__ as entrymod
    from kompactor_spark.queries import all_queries
    from kompactor_spark.session import get_spark

    import bench

    regs = all_queries()
    names = only or list(dict.fromkeys(entrymod._PRIORITY[:50] + bench.SF1_MATCHED + bench.HEADLINE))
    os.makedirs(OUT_DIR, exist_ok=True)

    spark = get_spark("r14-plan-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    report = {}
    for name in names:
        if name not in regs:
            continue
        try:
            spark.sparkContext.setJobDescription(f"plan-sweep: {name}")
            df = regs[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            with open(os.path.join(OUT_DIR, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(plan)
            report[name] = audit(plan)
            a = report[name]
            print(
                f"{name}: ex={a['exchanges']} range={a['range_exchanges']} "
                f"py={','.join(a['python_nodes']) or '-'} joins={','.join(a['joins']) or '-'}"
            )
        except Exception:
            report[name] = {"error": traceback.format_exc().splitlines()[-1]}
            print(f"{name}: ERROR {report[name]['error']}")
    with open(os.path.join(OUT_DIR, f"_audit_{tag}.json"), "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
