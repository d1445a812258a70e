"""Round-14 A/B: eliminate the final-sort sampling double-execution.

A global ``orderBy`` plans as ``Exchange rangepartitioning`` and Spark's
RangePartitioner computes its bounds by RUNNING the exchange's child
once for a reservoir sample, then the shuffle map tasks run the child
AGAIN — so everything between the sort and the nearest materialized
exchange executes twice (verified by accumulator probe this round:
a 4-partition mapInPandas kernel under orderBy ran 8 tasks; under a
hash exchange, 4). For queries whose final sort sits directly above an
expensive narrow subtree (a broadcast join, a window, per-row JSON/
n-gram compute), that is the single largest avoidable cost in the row.

Arms (old = registry shape, new = candidate):

- j19_nearest_value_join: sort the FACT by the output keys BELOW the
  1:1 broadcast Voronoi join (cells partition the real line, so each
  fact row emits exactly one output row and partition-wise order is
  preserved) — the BroadcastNestedLoopJoin leaves the doubled region
  entirely; no extra exchange. Residual global order is asserted
  against the old shape.
- j14_binned_interval_join / j8_asof_join / l4_repeated_ngrams /
  f7_json_extract: materialization barrier — ``repartition(sort keys)``
  (hash, conf-sized, AQE-coalescible) between the expensive subtree
  and the final orderBy, so range sampling re-reads a skinny shuffle
  instead of re-running the subtree.

Identity gate: each pair's results are compared row-exactly at sf0.1
(driver canonicalization: sorted columns, sort over all columns) before
any timing. Timing: interleaved same-session runs at benchdata/sf1,
sink protocol for the table-sized rows (j19/j14), full toPandas
otherwise — the bench.py methodology for each row.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kompactor_spark.queries import all_queries
from kompactor_spark.session import get_spark
from kompactor_spark.tables import fan_out, loader

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchdata", "sf1")
RUNS = 4


# --------------------------------------------------------------------- new shapes
def j19_new(spark, sf_dir):
    from pyspark.sql import Window

    T = loader(sf_dir, spark)
    prices = T("part").select(F.col("p_retailprice").alias("p")).distinct()
    wp = Window.orderBy("p")
    cells = prices.select(
        "p",
        F.coalesce((F.lag("p").over(wp) + F.col("p")) / 2, F.lit(-1e308)).alias("lo"),
        F.coalesce((F.col("p") + F.lead("p").over(wp)) / 2, F.lit(1e308)).alias("hi"),
    )
    f = (
        T("lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("up"),
        )
        # range-partition the FACT by the output keys BELOW the 1:1
        # broadcast join (the only exchange in the row); the local sort
        # happens ABOVE the join — EliminateSorts removes a Sort under a
        # Join, and up there it also orders the final output directly
        .repartitionByRange("l_orderkey", "l_linenumber")
    )
    return (
        f.join(F.broadcast(cells), (F.col("up") >= F.col("lo")) & (F.col("up") < F.col("hi")))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("up").alias("unit_price"),
            F.col("p").alias("nearest_price"),
            F.abs(F.col("up") - F.col("p")).alias("diff"),
        )
        .sortWithinPartitions("l_orderkey", "l_linenumber")
    )


def j14_new(spark, sf_dir):
    from kompactor_spark.operators.rangejoin import binned_interval_join

    T = loader(sf_dir, spark)
    ts_us = F.col("ts") - F.col("ts") % 1000
    ev = T("events")
    points = ev.select("event_id", ts_us.alias("pts"))
    incidents = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        ts_us.alias("t0"),
        (ts_us + 30 * 60 * 1_000_000_000).alias("t1"),
    )
    return (
        binned_interval_join(points, incidents, "pts", "t0", "t1", bucket_ns=3600 * 1_000_000_000)
        .select("event_id", "incident_id")
        .repartition("event_id", "incident_id")
        .orderBy("event_id", "incident_id")
    )


def j8_new(spark, sf_dir):
    from kompactor_spark.operators.asof import asof_join_split

    T = loader(sf_dir, spark)
    ev = T("events").withColumn("ts_us", F.col("ts") - F.col("ts") % 1000)
    return (
        asof_join_split(
            ev,
            on="user_id",
            ts="ts_us",
            left_when=F.col("event_type") == "error",
            right_when=F.col("event_type") == "signup",
            left_cols=["event_id"],
            left_ts_name="err_ts",
            right_ts_name="signup_ts",
        )
        .select("event_id", "user_id", "err_ts", "signup_ts")
        .repartition("event_id")
        .orderBy("event_id")
    )


def ngrams_new(spark, sf_dir):
    T = loader(sf_dir, spark)
    ts = F.split("text", " ")
    docs = fan_out(T("documents")).select("doc_id", ts.alias("ts")).where(F.size("ts") >= 3)
    grams = F.expr(
        "transform(sequence(1, size(ts) - 2), "
        "i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1), ' ', element_at(ts, i + 2)))"
    )
    return (
        docs.select(
            "doc_id",
            F.size(grams).cast("bigint").alias("n_grams"),
            F.size(F.array_distinct(grams)).cast("bigint").alias("n_distinct"),
        )
        .withColumn(
            "dup_frac",
            F.round(F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_grams"), 6),
        )
        .repartition("doc_id")
        .orderBy("doc_id")
    )


def f7_new(spark, sf_dir):
    T = loader(sf_dir, spark)
    j = F.from_json("props", "k bigint, missing string")
    return (
        fan_out(T("events"))
        .select("event_id", j.alias("j"))
        .select(
            "event_id",
            F.col("j.k").alias("k_val"),
            F.col("j.missing").alias("missing_val"),
        )
        .repartition("event_id")
        .orderBy("event_id")
    )


# --------------------------------------------------------------------- harness
def identical(spark, old_fn, new_fn, sf_dir) -> bool:
    a = old_fn(spark, sf_dir).toPandas()
    b = new_fn(spark, sf_dir).toPandas()
    if sorted(a.columns) != sorted(b.columns) or len(a) != len(b):
        return False
    cols = sorted(a.columns)
    a = a[cols].sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    b = b[cols].sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return a.equals(b)


def t_fetch(spark, fn, sf_dir):
    df = fn(spark, sf_dir)
    t0 = time.perf_counter()
    assert len(df.toPandas()) >= 0
    return time.perf_counter() - t0


def t_sink(spark, fn, sf_dir):
    import shutil
    import tempfile

    df = fn(spark, sf_dir)
    sink = os.path.join(tempfile.gettempdir(), "r14_ab_sink.parquet")
    t0 = time.perf_counter()
    df.write.mode("overwrite").parquet(sink)
    dt = time.perf_counter() - t0
    shutil.rmtree(sink, ignore_errors=True)
    return dt


def main() -> None:
    regs = all_queries()
    spark = get_spark("r14-sortexec-ab")
    spark.sparkContext.setLogLevel("ERROR")

    targets = [
        ("j19_nearest_value_join", j19_new, t_sink),
        ("j14_binned_interval_join", j14_new, t_sink),
        ("j8_asof_join", j8_new, t_fetch),
        ("l4_repeated_ngrams", ngrams_new, t_fetch),
        ("f7_json_extract", f7_new, t_fetch),
    ]
    out = {"identity_sf01": {}, "sf1": {}}
    for name, new_fn, _ in targets:
        spark.sparkContext.setJobDescription(f"identity: {name}")
        ok = identical(spark, regs[name], new_fn, SF01)
        out["identity_sf01"][name] = ok
        print(f"identity {name}: {'OK' if ok else 'MISMATCH'}", flush=True)

    for name, new_fn, timer in targets:
        if not out["identity_sf01"][name]:
            continue
        old_fn = regs[name]
        # warm both arms
        timer(spark, old_fn, SF1)
        timer(spark, new_fn, SF1)
        olds, news = [], []
        for i in range(RUNS):
            spark.sparkContext.setJobDescription(f"ab {name} old#{i}")
            olds.append(timer(spark, old_fn, SF1))
            spark.sparkContext.setJobDescription(f"ab {name} new#{i}")
            news.append(timer(spark, new_fn, SF1))
        out["sf1"][name] = {
            "old_median": round(statistics.median(olds), 3),
            "new_median": round(statistics.median(news), 3),
            "old_runs": [round(x, 3) for x in olds],
            "new_runs": [round(x, 3) for x in news],
            "timer": timer.__name__,
        }
        print(name, out["sf1"][name], flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r14_sortexec_ab_out.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
