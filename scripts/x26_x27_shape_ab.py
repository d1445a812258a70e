"""x26 + x27 shape A/B (round 13): de-serializing the remaining
low-cardinality/window sweeps found by the post-x23 §7c audit.

x26_trend_slope: the per-series min recentre was
``min(xs) OVER (PARTITION BY event_type)`` — an unordered window over
the bare 5-value key that shuffles the FULL event set into #series
tasks and buffers each series in one WindowExec. New shape: a 5-row
``groupBy(event_type).min`` broadcast back (one extra column-pruned
scan, fully parallel).

x27_interval_coverage: islands/coverage ran two serial per-key windows
(prefix max of end + island-id running sum) plus a (key, island) agg.
New shape (operators/sweepline.interval_coverage): telescoping sweep —
per-row contributions from the prefix max only; island ids never
materialized (one window + one bare-key agg). The first measurement
session showed the BUCKETED prefix-max lane loses at x27's user_id
cardinality (1.11x -> 1.40x: per-key sorts over ~1500 users already
parallelize, the bucket machinery is pure overhead), so the registry
keeps the per-key lane and buckets are opt-in for low-cardinality
callers; arm C keeps the bucketed lane measured.

Arms, interleaved per round in ONE session, identity-gated:
  A = frozen pre-round-13 shape (inline below)
  B = registry shape
  C = (x27 only) bucketed telescoping lane, n_buckets=64
  D = DuckDB oracle (threads=4)

Usage:  python scripts/x26_x27_shape_ab.py [rounds] [sf_dir]
Writes scripts/x26_x27_shape_ab[_sfN]_out.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_HOLD_NS = 300_000_000_000


def _out_path(sf_dir: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/"))
    suffix = "" if tag == "sf1" else f"_{tag}"
    return os.path.join(ROOT, "scripts", f"x26_x27_shape_ab{suffix}_out.json")


def x26_old_window_shape(spark, sf_dir):
    """FROZEN copy of the pre-round-13 x26 (min-over-bare-key-window)."""
    from pyspark.sql import Window, functions as F

    from kompactor_spark import fixedpoint as fx
    from kompactor_spark.tables import loader

    e = loader(sf_dir, spark)("events").select(
        "event_type",
        F.expr("ts div 1000000000").cast("long").alias("xs"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    x = (F.col("xs") - F.min("xs").over(Window.partitionBy("event_type"))).alias("x")
    r = e.select("event_type", x, "y")
    xy_hi, xy_lo = fx.limb_split(F.col("x") * F.col("y"), 24)
    x2_hi, x2_lo = fx.limb_split(F.col("x") * F.col("x"), 29)
    x_hi, x_lo = fx.limb_split(F.col("x"), 14)
    r = r.select(
        "event_type",
        "y",
        xy_hi.alias("__xy_hi"),
        xy_lo.alias("__xy_lo"),
        x2_hi.alias("__x2_hi"),
        x2_lo.alias("__x2_lo"),
        x_hi.alias("__x_hi"),
        x_lo.alias("__x_lo"),
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
            (
                F.round((num.cast("double") / den.cast("double")) / F.lit(100.0), 6)
                + F.lit(0.0)
            ).alias("slope_per_s"),
        )
        .orderBy("event_type")
    )


def x27_old_island_shape(spark, sf_dir):
    """FROZEN copy of the pre-round-13 x27 (two serial per-key windows
    + (key, island) agg)."""
    from pyspark.sql import Window, functions as F

    from kompactor_spark.tables import loader

    ts_us = F.col("ts") - F.col("ts") % 1000
    iv = loader(sf_dir, spark)("events").select(
        F.col("user_id").alias("k"),
        F.col("event_id").alias("tb"),
        ts_us.alias("t"),
        (ts_us + F.lit(_HOLD_NS)).alias("e"),
    )
    w_prev = (
        Window.partitionBy("k").orderBy("t", "tb").rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("k").orderBy("t", "tb").rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_end = F.max("e").over(w_prev)
    brk = F.when(prev_end.isNull() | (F.col("t") > prev_end), 1).otherwise(0)
    isl = iv.withColumn("island", F.sum(brk).over(w_run))
    return (
        isl.groupBy("k", "island")
        .agg(F.min("t").alias("s"), F.max("e").alias("en"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_islands"),
            F.sum(F.col("en") - F.col("s")).cast("bigint").alias("covered_ns"),
        )
        .withColumnRenamed("k", "user_id")
        .orderBy("user_id")
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(ROOT, "benchdata", "sf10")

    import duckdb

    from kompactor_spark.queries import all_oracles, all_queries
    from kompactor_spark.session import get_spark

    spark = get_spark("x26-x27-shape-ab")
    regs, oracles = all_queries(), all_oracles()
    def x27_bucketed(spark, sf_dir):
        from pyspark.sql import functions as F

        from kompactor_spark.operators.sweepline import interval_coverage
        from kompactor_spark.tables import loader

        ts_us = F.col("ts") - F.col("ts") % 1000
        iv = loader(sf_dir, spark)("events").select(
            "user_id",
            "event_id",
            ts_us.alias("t"),
            (ts_us + F.lit(_HOLD_NS)).alias("e"),
        )
        return (
            interval_coverage(iv, "user_id", "t", "e", "event_id", n_buckets=64)
            .withColumnRenamed("covered", "covered_ns")
            .orderBy("user_id")
        )

    jobs = {
        "x26_trend_slope": {"A_keyed_window": x26_old_window_shape},
        "x27_interval_coverage": {
            "A_island_windows": x27_old_island_shape,
            "C_bucketed": x27_bucketed,
        },
    }

    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET threads=4")
    p = os.path.join(sf_dir, "events.parquet")
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{src}')")

    out = {
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "sf_dir": sf_dir,
        "rounds": rounds,
        "protocol": "interleaved same-session, identity-gated; construction untimed",
    }

    def time_engine(fn):
        df = fn(spark, sf_dir)  # construction untimed (bench.py protocol)
        t0 = time.perf_counter()
        pdf = df.toPandas()
        assert len(pdf) >= 0
        return time.perf_counter() - t0

    for qname, old_arms in jobs.items():
        arms = dict(old_arms)
        arms["B_registry"] = regs[qname]
        ref = regs[qname](spark, sf_dir).toPandas()
        for a_name, fn in old_arms.items():
            if not fn(spark, sf_dir).toPandas().equals(ref):
                raise SystemExit(f"{qname}/{a_name}: arm outputs differ — A/B void")
        sql = oracles[qname]
        con.execute(sql).df()
        print(f"{qname}: identity gate passed", file=sys.stderr)

        times = {name: [] for name in arms}
        times["duck"] = []
        for r in range(rounds):
            for name, fn in arms.items():
                times[name].append(time_engine(fn))
            t0 = time.perf_counter()
            con.execute(sql).df()
            times["duck"].append(time.perf_counter() - t0)
            print(f"{qname}: round {r + 1}/{rounds}", file=sys.stderr)

        d = statistics.median(times["duck"])
        rec = {
            "duck_sec": round(d, 3),
            "duck_raw": [round(x, 3) for x in times["duck"]],
        }
        for name in arms:
            m = statistics.median(times[name])
            rec[name] = {
                "sec": round(m, 3),
                "ratio": round(m / d, 3),
                "raw": [round(x, 3) for x in times[name]],
            }
        out[qname] = rec

    with open(_out_path(sf_dir), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    con.close()
    spark.stop()


if __name__ == "__main__":
    main()
