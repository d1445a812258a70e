"""Round-15 per-job decompositions: m11_basket_lift (its 1.8x trigger
FIRED in the round-15 clean window — scripts/r15_cleanwindow_out.json,
w1 ratio 1.93x) and l4_surprisal (VERDICT r14 #3: 3.56x same-window,
top of the sf1 ratio board; floor-dominated ~1.0 s row).

For each query: time each subtree alone via the noop sink (guide §1.4),
count the Spark jobs the full query launches (statusTracker over a job
group), and time the full query under its bench protocol. The deltas
say whether the cost is job-launch floor, a re-executed subtree, or one
expensive stage — the decomposition that picks the fix (or the
pre-committed trigger sentence if nothing is on the table).

Usage:  python scripts/r15_decompose.py [runs] [sf_dir]
Writes scripts/r15_decompose_out.json and prints one JSON line.
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
OUT = os.path.join(ROOT, "scripts", "r15_decompose_out.json")


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(fn, runs: int) -> dict:
    fn()  # warm-up
    xs = [None] * runs
    for i in range(runs):
        t0 = time.perf_counter()
        fn()
        xs[i] = time.perf_counter() - t0
    return {"median_sec": round(statistics.median(xs), 3), "runs": [round(x, 3) for x in xs]}


def count_jobs(spark, fn) -> int:
    sc = spark.sparkContext
    group = f"r15-decompose-{time.monotonic_ns()}"
    sc.setJobGroup(group, "job count probe")
    try:
        fn()
    finally:
        sc.setJobGroup(None, None)
    return len(sc.statusTracker().getJobIdsForGroup(group))


def m11_parts(spark, sf_dir):
    from pyspark.sql import functions as F

    from kompactor_spark.queries import graph as G
    from kompactor_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    buckets = (
        li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("us")).select("us")
    )
    pairs = G._pair_count_kernel(buckets, 3).select(
        F.col("u").alias("p1"), F.col("v").alias("p2"), F.col("w").alias("both")
    )
    n = li.agg(F.countDistinct("l_orderkey").cast("bigint").alias("n_orders"))
    sup = li.groupBy("l_partkey").agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("s")
    )
    return {
        "pairs_kernel": lambda: noop(pairs),
        "supports": lambda: noop(sup),
        "n_orders": lambda: noop(n),
    }


def surprisal_parts(spark, sf_dir):
    from pyspark.sql import functions as F

    from kompactor_spark.operators import text as X
    from kompactor_spark.queries.llm_pipeline import _collision_guarded_tf
    from kompactor_spark.tables import fan_out, loader

    T = loader(sf_dir, spark)
    tok = (
        fan_out(T("documents"))
        .select("doc_id", F.explode(X.tokens("text")).alias("t"))
        .select("doc_id", F.xxhash64("t").alias("th"), F.hash("t").alias("g"))
    )
    dt = tok.groupBy("doc_id", "th").agg(
        F.count(F.lit(1)).cast("double").alias("cd"),
        F.min("g").alias("mn"),
        F.max("g").alias("mx"),
    )
    tf = _collision_guarded_tf(dt)
    tot = tf.agg(F.sum("c").cast("double").alias("total"))
    return {
        "tokenize_dt": lambda: noop(dt),
        "tf_guarded": lambda: noop(tf),
        "tot_1row": lambda: noop(tot),
    }


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else SF1

    from kompactor_spark.queries import all_queries
    from kompactor_spark.session import get_spark

    spark = get_spark("r15-decompose")
    regs = all_queries()
    res = {
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "sf_dir": sf_dir,
        "protocol": (
            "noop-sink subtree timings (guide 1.4) + job count per full "
            "query (statusTracker over a job group); full-query timing "
            "under the bench row protocol (m11 eager toPandas, surprisal "
            "lazy toPandas)"
        ),
    }

    for name, parts_fn, proto in (
        ("m11_basket_lift", m11_parts, "eager"),
        ("l4_surprisal", surprisal_parts, "lazy"),
    ):
        fn = regs[name]
        spark.sparkContext.setJobDescription(f"r15-decompose:{name}")
        entry: dict = {}

        def full() -> None:
            pdf = fn(spark, sf_dir).toPandas()
            assert len(pdf) >= 0

        entry["full"] = timed(full, runs)
        entry["n_jobs_full"] = count_jobs(spark, full)
        for part, thunk in parts_fn(spark, sf_dir).items():
            entry[part] = timed(thunk, runs)
            entry[f"n_jobs_{part}"] = count_jobs(spark, thunk)
        res[name] = entry
        print(json.dumps({name: entry}), flush=True)

    with open(OUT, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
