"""x23 sweep-line shape A/B (round 13): bucketed two-level prefix sum
vs the per-key window.

The old running sum — SUM(d) OVER (PARTITION BY event_type ORDER BY
t, d) — serializes the whole 2|events|-point sweep into ONE sort task
per series key (5 keys in the grading data): the low-cardinality-window
pathology at any scale, and the reason x23 straddled at sf1
(1.53x/1.69x r13 windows) while sitting at 0.98x at sf10. The new
shape (operators/sweepline.peak_concurrency) cuts the time axis into
n_buckets ranges, runs the within-bucket cumsum in parallel over
(key x bucket) groups, and adds each bucket's exclusive offset from a
model-sized (keys x buckets) frame; peaks reduce bucket-locally first.

Arms, interleaved per round in ONE session, identity-gated:
  A = old per-key-window shape (frozen inline below)
  B = registry shape (bucketed two-level)
  D = DuckDB oracle (threads=4)

Usage:  python scripts/x23_shape_ab.py [rounds] [sf_dir]
Writes scripts/x23_shape_ab[_sfN]_out.json and prints one JSON line.
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
    return os.path.join(ROOT, "scripts", f"x23_shape_ab{suffix}_out.json")


def x23_old_window_shape(spark, sf_dir):
    """FROZEN copy of the pre-round-13 per-key-window sweep."""
    from pyspark.sql import Window, functions as F

    from kompactor_spark.tables import loader

    ts_us = F.col("ts") - F.col("ts") % 1000
    iv = loader(sf_dir, spark)("events").select(
        "event_type", ts_us.alias("t"), (ts_us + F.lit(_HOLD_NS)).alias("e")
    )
    k, s, e = F.col("event_type"), F.col("t"), F.col("e")
    pts = iv.select(k.alias("k"), s.alias("t"), F.lit(1).alias("d")).unionByName(
        iv.select(k.alias("k"), e.alias("t"), F.lit(-1).alias("d"))
    )
    w_run = Window.partitionBy("k").orderBy("t", "d")
    w_all = Window.partitionBy("k")
    run = pts.withColumn("c", F.sum("d").over(w_run))
    return (
        run.withColumn("peak", F.max("c").over(w_all))
        .where(F.col("c") == F.col("peak"))
        .groupBy("k")
        .agg(
            F.max("c").cast("bigint").alias("peak_concurrency"),
            F.min("t").cast("bigint").alias("first_peak_ns"),
        )
        .withColumnRenamed("k", "event_type")
        .orderBy("event_type")
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(ROOT, "benchdata", "sf1")

    import duckdb

    from kompactor_spark.queries import all_oracles, all_queries
    from kompactor_spark.session import get_spark

    spark = get_spark("x23-shape-ab")
    regs, oracles = all_queries(), all_oracles()
    arms = {"A_keyed_window": x23_old_window_shape, "B_bucketed": regs["x23_max_concurrency"]}

    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET threads=4")
    p = os.path.join(sf_dir, "events.parquet")
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{src}')")
    sql = oracles["x23_max_concurrency"]

    ref = arms["B_bucketed"](spark, sf_dir).toPandas()
    got = arms["A_keyed_window"](spark, sf_dir).toPandas()
    if not got.equals(ref):
        raise SystemExit("arm outputs differ — A/B void")
    con.execute(sql).df()
    print("identity gate passed", file=sys.stderr)

    def time_engine(fn):
        df = fn(spark, sf_dir)  # construction untimed (bench.py protocol)
        t0 = time.perf_counter()
        pdf = df.toPandas()
        assert len(pdf) >= 0
        return time.perf_counter() - t0

    times = {name: [] for name in arms}
    times["duck"] = []
    for r in range(rounds):
        for name, fn in arms.items():
            times[name].append(time_engine(fn))
        t0 = time.perf_counter()
        con.execute(sql).df()
        times["duck"].append(time.perf_counter() - t0)
        print(f"round {r + 1}/{rounds}", file=sys.stderr)

    d = statistics.median(times["duck"])
    out = {
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "sf_dir": sf_dir,
        "rounds": rounds,
        "duck_sec": round(d, 3),
        "duck_raw": [round(x, 3) for x in times["duck"]],
        "protocol": "interleaved same-session, identity-gated; construction untimed",
    }
    for name in arms:
        m = statistics.median(times[name])
        out[name] = {
            "sec": round(m, 3),
            "ratio": round(m / d, 3),
            "raw": [round(x, 3) for x in times[name]],
        }
    with open(_out_path(sf_dir), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    con.close()
    spark.stop()


if __name__ == "__main__":
    main()
