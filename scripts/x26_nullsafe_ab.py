"""Round-14 x26 recentre-join A/B: plain USING equi-join (round 13)
vs the null-safe <=> join (round 14, ADVICE r13 fix).

The fix changes correctness for NULL event_type (the USING join drops
that group; <=> keeps it, matching the window semantics it replaced) —
this measures that it does NOT change cost: both plans must stay
BroadcastHashJoin and the interleaved medians must tie. The grading
data has no NULL event_type, so the arms are identity-comparable.

Usage:  python scripts/x26_nullsafe_ab.py [rounds]
Writes scripts/x26_nullsafe_ab_out.json.
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
OUT = os.path.join(ROOT, "scripts", "x26_nullsafe_ab_out.json")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    from kompactor_spark import fixedpoint as fx
    from kompactor_spark.queries import all_queries
    from kompactor_spark.session import get_spark
    from kompactor_spark.tables import load_table

    spark = get_spark("x26-nullsafe-ab")

    def old_shape():
        """The round-13 USING-join variant (drops a NULL group)."""
        e = load_table(spark, SF10, "events").select(
            "event_type",
            F.expr("ts div 1000000000").cast("long").alias("xs"),
            F.round(F.col("value") * 100).cast("long").alias("y"),
        )
        mins = e.groupBy("event_type").agg(F.min("xs").alias("_xs0"))
        r = e.join(F.broadcast(mins), "event_type").select(
            "event_type", (F.col("xs") - F.col("_xs0")).alias("x"), "y"
        )
        xy_hi, xy_lo = fx.limb_split(F.col("x") * F.col("y"), 24)
        x2_hi, x2_lo = fx.limb_split(F.col("x") * F.col("x"), 29)
        x_hi, x_lo = fx.limb_split(F.col("x"), 14)
        r = r.select(
            "event_type", "y",
            xy_hi.alias("__xy_hi"), xy_lo.alias("__xy_lo"),
            x2_hi.alias("__x2_hi"), x2_lo.alias("__x2_lo"),
            x_hi.alias("__x_hi"), x_lo.alias("__x_lo"),
        )
        m = r.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
            fx.exact_sum_units("__x_hi", "__x_lo", 14).alias("sx"),
            F.sum("y").cast("decimal(38,0)").alias("sy"),
            fx.exact_sum_units("__xy_hi", "__xy_lo", 24).alias("sxy"),
            fx.exact_sum_units("__x2_hi", "__x2_lo", 29).alias("sx2"),
        )
        num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
        den = F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")
        return (
            m.where(den != 0)
            .select(
                "event_type",
                F.col("n").cast("bigint").alias("n_samples"),
                (F.round((num.cast("double") / den.cast("double")) / 100.0, 6) + 0.0).alias(
                    "slope_per_s"
                ),
            )
            .orderBy("event_type")
        )

    new_fn = all_queries()["x26_trend_slope"]

    def run(fn_df):
        t0 = time.perf_counter()
        pdf = fn_df().toPandas()
        return time.perf_counter() - t0, pdf

    arm_a = lambda: new_fn(spark, SF10)  # noqa: E731
    arm_b = old_shape

    # warm-up + identity gate (no NULL event_type in grading data)
    _, a = run(arm_a)
    _, b = run(arm_b)
    pa = a.sort_values(list(a.columns)).reset_index(drop=True)
    pb = b.sort_values(list(b.columns)).reset_index(drop=True)
    assert pa.equals(pb), "arms diverge — A/B invalid"

    # plan pin: the null-safe arm keeps the broadcast join
    pa_new = new_fn(spark, SF10)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in pa_new, "new arm lost the broadcast join"

    ta, tb = [], []
    for _ in range(rounds):
        ta.append(run(arm_a)[0])
        tb.append(run(arm_b)[0])
    res = {
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "identity_gate": "pass",
        "broadcast_pin": "pass",
        "nullsafe_median_sec": round(statistics.median(ta), 3),
        "using_median_sec": round(statistics.median(tb), 3),
        "nullsafe_runs": [round(x, 3) for x in ta],
        "using_runs": [round(x, 3) for x in tb],
    }
    with open(OUT, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
