"""Round-15 shape A/Bs for the two decomposition targets.

m11_basket_lift (trigger FIRED at 1.93x/1.91x — r15_cleanwindow):
  the r15 decomposition (scripts/r15_decompose_out.json) splits the
  6.6 s eager full into pairs-kernel 3.2 s + supports 1.1 s +
  n_orders 0.6 s + joins/fetch tail — lineitem is scanned THREE times
  (baskets, per-part distinct-order supports, global distinct count).
  Arm B folds supports and n onto the ONE collect_set exchange: both
  derive from the baskets frame (explode(us) -> count per part ==
  countDistinct(l_orderkey); count of basket rows == n_orders — exact
  by construction), with a tautological size(us) >= 0 filter on the
  count consumer so all three consumers keep byte-identical partial
  aggregates over one Exchange(l_orderkey) and ReuseExchange fires
  (the surprisal tf>=1 lesson). One scan instead of three.

l4_surprisal (VERDICT r14 #3: 3.56x same-window, 11 jobs for 1.6 s —
  launch-floor dominated): the tot 1-row aggregate re-runs the vocab
  final-agg inside its own broadcast build and its BNLJ touches every
  token-level row. Arm B folds total into the tf broadcast itself via
  a single-partition window over the vocab-sized tf frame (bounded
  exactly like the broadcast side it rides; c is integer-valued
  double, so the window sum is EXACT — no FP reassociation risk), so
  the probe join carries total with zero extra pass and two jobs
  (tot's stage + its broadcast build) disappear.

Protocol: identity gate first (engine output vs DuckDB oracle via
oracle.compare_frames at sf1 AND arms byte-compared to the registry
output), then interleaved same-session timing under the bench row
protocol (m11 eager toPandas, surprisal lazy toPandas).

Usage:  python scripts/r15_m11_surprisal_ab.py [rounds]
Writes scripts/r15_m11_surprisal_ab_out.json and prints one JSON line.
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
OUT = os.path.join(ROOT, "scripts", "r15_m11_surprisal_ab_out.json")


def m11_folded(spark, sf_dir):
    from pyspark.sql import functions as F

    from kompactor_spark.queries import graph as G
    from kompactor_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("us"))
    pairs = G._pair_count_kernel(baskets.select("us"), 3).select(
        F.col("u").alias("p1"), F.col("v").alias("p2"), F.col("w").alias("both")
    )
    sup = (
        baskets.select(F.explode("us").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("s"))
    )
    n = (
        baskets.where(F.size("us") >= 0)  # tautological: keeps partial aggs identical
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    )
    s1 = sup.select(F.col("l_partkey").alias("p1"), F.col("s").alias("s1"))
    s2 = sup.select(F.col("l_partkey").alias("p2"), F.col("s").alias("s2"))
    both_d = F.col("both").cast("double")
    return (
        pairs.join(s1, "p1")
        .join(s2, "p2")
        .crossJoin(F.broadcast(n))
        .select(
            "p1",
            "p2",
            "both",
            "s1",
            "s2",
            F.round(both_d / F.col("n_orders"), 6).alias("support"),
            F.round(both_d / F.col("s1"), 6).alias("confidence"),
            F.round(
                both_d * F.col("n_orders") / (F.col("s1").cast("double") * F.col("s2")), 6
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "p1", "p2")
        .limit(25)
    )


def surprisal_window_total(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kompactor_spark.operators import text as X
    from kompactor_spark.queries.llm_pipeline import _collision_guarded_tf
    from kompactor_spark.session import dim_broadcast
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
    tf = _collision_guarded_tf(dt).withColumn(
        "total", F.sum("c").over(Window.partitionBy())
    )
    probe = dt.where(F.col("mn") <= F.col("mx"))
    return (
        probe.join(dim_broadcast(tf), "th")
        .groupBy("doc_id")
        .agg(
            F.sum("cd").cast("bigint").alias("n_tokens"),
            (
                F.round(
                    F.sum(F.col("cd") * -F.log(F.col("c") / F.col("total")))
                    / F.sum("cd"),
                    6,
                )
                + F.lit(0.0)
            ).alias("surprisal"),
        )
        .orderBy("doc_id")
    )


def _duck_connect(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET threads=4")
    for t in ("part orders lineitem documents").split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    return con


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    from kompactor_spark.oracle import compare_frames
    from kompactor_spark.queries import all_oracles, all_queries
    from kompactor_spark.session import get_spark

    spark = get_spark("r15-m11-surprisal-ab")
    regs, oracles = all_queries(), all_oracles()
    con = _duck_connect(SF1)

    cases = {
        "m11_basket_lift": {
            "A_registry": regs["m11_basket_lift"],
            "B_folded_scans": m11_folded,
            "proto": "eager",
        },
        "l4_surprisal": {
            "A_registry": regs["l4_surprisal"],
            "B_window_total": surprisal_window_total,
            "proto": "lazy",
        },
    }

    res: dict = {
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "rounds": rounds,
        "sf_dir": SF1,
    }
    for name, case in cases.items():
        proto = case.pop("proto")
        sql = oracles[name]
        arms = case
        spark.sparkContext.setJobDescription(f"r15-ab:{name}:gate")
        duck_pdf = con.execute(sql).df()
        ref = None
        for arm, fn in arms.items():
            got = fn(spark, SF1).toPandas()
            cmp = compare_frames(name, got, duck_pdf)
            if not cmp.ok:
                raise SystemExit(f"{name}/{arm}: oracle gate FAILED: {cmp.detail}")
            if ref is None:
                ref = got
            elif not got.equals(ref):
                raise SystemExit(f"{name}/{arm}: differs from registry output — A/B void")
        print(f"{name}: identity gates passed", file=sys.stderr)

        def timer(fn):
            if proto == "eager":
                t0 = time.perf_counter()
                pdf = fn(spark, SF1).toPandas()
                assert len(pdf) >= 0
                return time.perf_counter() - t0
            df = fn(spark, SF1)
            t0 = time.perf_counter()
            pdf = df.toPandas()
            assert len(pdf) >= 0
            return time.perf_counter() - t0

        times = {arm: [] for arm in arms}
        for arm, fn in arms.items():
            timer(fn)  # warm-up
        for r in range(rounds):
            for arm, fn in arms.items():
                spark.sparkContext.setJobDescription(f"r15-ab:{name}:{arm}:r{r}")
                times[arm].append(timer(fn))
        entry = {}
        for arm in arms:
            entry[arm] = {
                "median_sec": round(statistics.median(times[arm]), 3),
                "runs": [round(x, 3) for x in times[arm]],
            }
        res[name] = entry
        print(json.dumps({name: entry}), flush=True)

    con.close()
    with open(OUT, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
