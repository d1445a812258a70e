"""Per-job decompositions for the two top-of-board sf10 rows
(VERDICT r13 #3): l2_containment_collapsed (1.82x) and j8_asof_join
(1.65x) get the same treatment the ANN straddlers got in r11 — measure
WHERE the seconds go so the pre-committed fix trigger names the part
that would be spent on.

l2_containment_collapsed (engine_sec artifact 1.36 s; kernel worker
body previously measured 0.44 s):

  floor     — spark.range(1).count(): per-job scheduler floor
  collapse  — fresh groupBy(text) collapse + localCheckpoint
              materialization via count (the full-corpus text shuffle)
  dispatch  — _collapsed_small_input on a PRE-materialized canon (the
              one-job count probe the graded row pays)
  kernel    — _pairs_kernel on the pre-materialized canon, full graded
              tail (round/orderBy/toPandas)
  full      — the graded row, eager construction + pandas fetch

  checkable claim: full ~= collapse + dispatch + kernel (each stage
  includes its own job floors, so the sum slightly over-counts).

j8_asof_join (engine_sec artifact 2.83 s, A/B settled 1.45 s):

  floor     — as above
  scan      — the tagged-union projection (scan + filter + conditional
              project) materialized by a partial agg: NO user shuffle
  window    — the full asof merge (scan + user-key shuffle + sort +
              running last + left filter) materialized by a partial
              agg: everything but the final global orderBy + fetch
  full      — the graded row (adds orderBy(event_id) + toPandas of the
              ~error-count result)

  attribution: shuffle+window ~= window - scan; order+fetch boundary
  ~= full - window; scan-side ~= scan - floor.

All stages interleaved round-robin per repetition (same-window
discipline), medians of N. Writes scripts/r14_decompose_out.json.

Usage:  python scripts/r14_decompose.py [rounds]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF10 = os.path.join(ROOT, "benchdata", "sf10")
OUT = os.path.join(ROOT, "scripts", "r14_decompose_out.json")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    from kompactor_spark.operators.asof import asof_join_split
    from kompactor_spark.operators.dedup import (
        _collapsed_small_input,
        _pairs_kernel,
    )
    from kompactor_spark.queries import all_queries
    from kompactor_spark.session import get_spark
    from kompactor_spark.tables import load_table

    spark = get_spark("r14-decompose")
    regs = all_queries()

    def timed(thunk) -> float:
        t0 = time.perf_counter()
        thunk()
        return time.perf_counter() - t0

    # ---------------- l2_containment_collapsed stages ----------------
    docs = load_table(spark, SF10, "documents")

    def fresh_canon():
        return (
            docs.groupBy("text")
            .agg(
                F.min("doc_id").alias("doc_id"),
                F.count(F.lit(1)).cast("bigint").alias("__n_copies"),
            )
            .localCheckpoint(eager=False)
        )

    # pre-materialized canon reused by the dispatch/kernel stages
    canon = fresh_canon()
    canon.count()

    def stage_collapse():
        fresh_canon().count()

    def stage_dispatch():
        _collapsed_small_input(canon, "text")

    def stage_kernel():
        pdf = (
            _pairs_kernel(
                canon,
                "doc_id",
                "text",
                3,
                0.12,
                1000,
                metric="containment",
                copies_col="__n_copies",
            )
            .select(
                "id_a",
                "id_b",
                F.round("containment", 6).alias("containment"),
                "n_copies_a",
                "n_copies_b",
            )
            .orderBy("id_a", "id_b")
            .toPandas()
        )
        assert len(pdf) >= 0

    def stage_cont_full():
        # eager protocol: construction (collapse checkpoint) inside the
        # outer timer, exactly like the graded bench row
        pdf = regs["l2_containment_collapsed"](spark, SF10).toPandas()
        assert len(pdf) >= 0

    # ---------------------- j8_asof_join stages ----------------------
    ev = load_table(spark, SF10, "events").withColumn(
        "ts_us", F.col("ts") - F.col("ts") % 1000
    )
    left_when = F.col("event_type") == "error"
    right_when = F.col("event_type") == "signup"

    def stage_scan():
        u = ev.where(left_when | right_when).select(
            "user_id",
            F.col("ts_us").alias("_t"),
            F.when(left_when, F.lit(1)).otherwise(F.lit(0)).alias("_side"),
            F.when(left_when, F.col("event_id")).alias("event_id"),
            F.when(~left_when, F.col("ts_us")).alias("_r"),
        )
        u.agg(F.count("event_id"), F.avg("_r"), F.avg("_t")).collect()

    def asof_frame():
        return asof_join_split(
            ev,
            on="user_id",
            ts="ts_us",
            left_when=left_when,
            right_when=right_when,
            left_cols=["event_id"],
            left_ts_name="err_ts",
            right_ts_name="signup_ts",
        ).select("event_id", "user_id", "err_ts", "signup_ts")

    def stage_window():
        asof_frame().agg(
            F.count(F.lit(1)), F.avg("signup_ts"), F.avg("err_ts")
        ).collect()

    def stage_j8_full():
        pdf = regs["j8_asof_join"](spark, SF10).toPandas()
        assert len(pdf) >= 0

    def stage_floor():
        spark.range(1).count()

    stages = {
        "floor": stage_floor,
        "cont_collapse": stage_collapse,
        "cont_dispatch": stage_dispatch,
        "cont_kernel": stage_kernel,
        "cont_full": stage_cont_full,
        "j8_scan": stage_scan,
        "j8_window": stage_window,
        "j8_full": stage_j8_full,
    }
    # warm-up: one untimed pass of everything
    for fn in stages.values():
        fn()

    samples: dict[str, list[float]] = {k: [] for k in stages}
    for _ in range(rounds):
        for k, fn in stages.items():  # interleaved round-robin
            samples[k].append(timed(fn))

    med = {k: round(statistics.median(v), 3) for k, v in samples.items()}
    res = {
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "rounds": rounds,
        "medians_sec": med,
        "runs_sec": {k: [round(x, 3) for x in v] for k, v in samples.items()},
        "containment_attribution": {
            "collapse_shuffle": med["cont_collapse"],
            "dispatch_probe": med["cont_dispatch"],
            "kernel_plus_fetch": med["cont_kernel"],
            "stage_sum": round(
                med["cont_collapse"] + med["cont_dispatch"] + med["cont_kernel"], 3
            ),
            "full_row": med["cont_full"],
        },
        "j8_attribution": {
            "scan_project": round(med["j8_scan"] - med["floor"], 3),
            "shuffle_sort_window": round(med["j8_window"] - med["j8_scan"], 3),
            "order_plus_fetch": round(med["j8_full"] - med["j8_window"], 3),
            "full_row": med["j8_full"],
        },
    }
    with open(OUT, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
