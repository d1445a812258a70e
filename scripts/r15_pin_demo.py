"""Round-15 pin de-vacuization demo (ADVICE r14 / VERDICT r14 #2).

The strengthened plan pins in tests/test_r14_sort_shapes.py assert the
real invariant — no Exchange between the top local Sort and the join,
broadcast join type, no rep_id hash exchange. This script PROVES the
pins are load-bearing: it re-plans l2_dedup_clusters_collapsed and
j19_nearest_value_join in a session with autoBroadcastJoinThreshold=-1
and the broadcast hint suppressed (F.broadcast patched to identity at
construction time — the exact regression the pins guard: someone drops
the hint and the planner picks SMJ / Cartesian), and shows each
strengthened assertion FAIL there while PASSING on the shipped tree.

Usage:  python scripts/r15_pin_demo.py
Writes scripts/r15_pin_demo_out.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "scripts", "r15_pin_demo_out.json")
SF = "/root/testdata/sf0.001"


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def clusters_pin(p: str) -> list[str]:
    """The strengthened clusters pin, returned as a list of failures."""
    fails = []
    if "rangepartitioning(doc_id" not in p:
        fails.append("rangepartitioning(doc_id missing")
    if "BroadcastHashJoin" not in p:
        fails.append("BroadcastHashJoin missing")
    if "hashpartitioning(rep_id" in p:
        fails.append("rep_id hash exchange present (order destroyed)")
    if "BroadcastHashJoin" in p:
        join_pos, sort_pos = p.index("BroadcastHashJoin"), p.index("Sort")
        if not (sort_pos < join_pos and "Exchange" not in p[sort_pos:join_pos]):
            fails.append("Exchange between top Sort and join")
    return fails


def j19_pin(p: str) -> list[str]:
    fails = []
    if "rangepartitioning(l_orderkey" not in p:
        fails.append("rangepartitioning(l_orderkey missing")
    if "BroadcastNestedLoopJoin" not in p:
        fails.append("BroadcastNestedLoopJoin missing")
    else:
        join_pos, sort_pos = p.index("BroadcastNestedLoopJoin"), p.index("Sort")
        if not (sort_pos < join_pos and "Exchange" not in p[sort_pos:join_pos]):
            fails.append("Exchange between top Sort and join")
        if p.index("rangepartitioning(l_orderkey") <= join_pos:
            fails.append("range exchange not below the join")
    return fails


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from kompactor_spark.queries import all_queries
    from kompactor_spark.session import ensure_conf

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("r15-pin-demo")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .getOrCreate()
    )
    ensure_conf(spark)
    Q = all_queries()

    res = {"conf": "autoBroadcastJoinThreshold=-1 (hintless fallback = SMJ/Cartesian)"}

    # shipped tree: hints present — pins must PASS even with auto-broadcast off
    p_ship_clusters = plan(Q["l2_dedup_clusters_collapsed"](spark, SF))
    p_ship_j19 = plan(Q["j19_nearest_value_join"](spark, SF))
    res["shipped_clusters_pin_failures"] = clusters_pin(p_ship_clusters)
    res["shipped_j19_pin_failures"] = j19_pin(p_ship_j19)

    # regression arm: suppress every broadcast hint at construction time
    real_broadcast = F.broadcast
    F.broadcast = lambda df: df  # type: ignore[assignment]
    try:
        p_nohint_clusters = plan(Q["l2_dedup_clusters_collapsed"](spark, SF))
        try:
            p_nohint_j19 = plan(Q["j19_nearest_value_join"](spark, SF))
            res["nohint_j19_pin_failures"] = j19_pin(p_nohint_j19)
        except Exception as e:  # cartesian without implicit cross-join conf
            res["nohint_j19_pin_failures"] = [f"planning failed loudly: {e}"[:200]]
    finally:
        F.broadcast = real_broadcast
    res["nohint_clusters_pin_failures"] = clusters_pin(p_nohint_clusters)

    res["demo_ok"] = (
        not res["shipped_clusters_pin_failures"]
        and not res["shipped_j19_pin_failures"]
        and bool(res["nohint_clusters_pin_failures"])
        and bool(res["nohint_j19_pin_failures"])
    )
    with open(OUT, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
