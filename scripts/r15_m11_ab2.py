"""Round-15 m11 shape A/B, round 2 (trigger fired at 1.93x/1.91x).

Deep decomposition (this file's session + scripts/r15_decompose_out.json):
scan 0.2 s, collect_set baskets 1.7 s, pair kernel ON TOP of baskets
~2.4 s — the per-basket Python loop over 1.47M <=7-item baskets is the
cost, not the shuffle. The r13 negative arm (size-grouped mapInArrow)
kept the loop in Python; this round tries the JVM-native expansion the
r13 A/B never measured: array_sort(collect_set) -> nested transform()
generates the i<j pairs as structs -> explode -> partial-agg count
(guide §4.1: built-in higher-order functions remove the reason for the
UDF; the map-side partial agg replaces the kernel's np.unique partials).

Arms (interleaved, identity-gated vs the DuckDB oracle AND the registry
output byte-compare):
  A = registry (Arrow pair kernel)
  B = A + supports/n folded onto the baskets exchange (r15 arm B rerun
      — its first window was a wash inside a 4.7-10.4 s noise band)
  C = JVM pair expansion + folded supports/n (zero Python, one scan)

Usage:  python scripts/r15_m11_ab2.py [rounds]
Writes scripts/r15_m11_ab2_out.json and prints one JSON line.
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
OUT = os.path.join(ROOT, "scripts", "r15_m11_ab2_out.json")
_MIN = 3


def _finish(pairs, sup, n):
    from pyspark.sql import functions as F

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


def _folded_sides(baskets):
    from pyspark.sql import functions as F

    sup = (
        baskets.select(F.explode("us").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("s"))
    )
    n = baskets.where(F.size("us") >= 0).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )
    return sup, n


def m11_B(spark, sf_dir):
    from pyspark.sql import functions as F

    from kompactor_spark.queries import graph as G
    from kompactor_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("us"))
    pairs = G._pair_count_kernel(baskets.select("us"), _MIN).select(
        F.col("u").alias("p1"), F.col("v").alias("p2"), F.col("w").alias("both")
    )
    sup, n = _folded_sides(baskets)
    return _finish(pairs, sup, n)


def m11_C(spark, sf_dir):
    from pyspark.sql import functions as F

    from kompactor_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("us")
    )
    # i<j pair expansion entirely in JVM codegen: for the 0-based i-th
    # element x, pair it with every later element (slice is 1-based, so
    # the tail after i starts at position i+2); flatten + explode emits
    # one struct per pair, and the groupBy's map-side partial agg plays
    # the role of the kernel's np.unique partials.
    pairs = (
        baskets.select(
            F.explode(
                F.flatten(
                    F.expr(
                        "transform(us, (x, i) -> "
                        "transform(slice(us, i + 2, size(us)), y -> "
                        "struct(x AS u, y AS v)))"
                    )
                )
            ).alias("p")
        )
        .groupBy(F.col("p.u").alias("p1"), F.col("p.v").alias("p2"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("both"))
        .where(F.col("both") >= _MIN)
    )
    sup, n = _folded_sides(baskets)
    return _finish(pairs, sup, n)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 7

    import duckdb

    from kompactor_spark.oracle import compare_frames
    from kompactor_spark.queries import all_oracles, all_queries
    from kompactor_spark.session import get_spark

    spark = get_spark("r15-m11-ab2")
    regs, oracles = all_queries(), all_oracles()
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET threads=4")
    p = os.path.join(SF1, "lineitem.parquet")
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{src}')")
    sql = oracles["m11_basket_lift"]

    arms = {"A_registry": regs["m11_basket_lift"], "B_folded": m11_B, "C_jvm_pairs": m11_C}

    duck_pdf = con.execute(sql).df()
    ref = None
    for arm, fn in arms.items():
        got = fn(spark, SF1).toPandas()
        cmp = compare_frames("m11_basket_lift", got, duck_pdf)
        if not cmp.ok:
            raise SystemExit(f"{arm}: oracle gate FAILED: {cmp.detail}")
        if ref is None:
            ref = got
        elif not got.equals(ref):
            raise SystemExit(f"{arm}: differs from registry output — A/B void")
    print("identity gates passed", file=sys.stderr)

    def timer(fn):  # EAGER (bench SF1_EAGER_CONSTRUCT protocol)
        t0 = time.perf_counter()
        pdf = fn(spark, SF1).toPandas()
        assert len(pdf) >= 0
        return time.perf_counter() - t0

    times = {arm: [] for arm in arms}
    times["duck"] = []
    for arm, fn in arms.items():
        timer(fn)  # warm-up
    for r in range(rounds):
        for arm, fn in arms.items():
            spark.sparkContext.setJobDescription(f"r15-m11-ab2:{arm}:r{r}")
            times[arm].append(timer(fn))
        t0 = time.perf_counter()
        assert len(con.execute(sql).df()) >= 0
        times["duck"].append(time.perf_counter() - t0)

    d = statistics.median(times["duck"])
    res = {
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "rounds": rounds,
        "duck_sec": round(d, 3),
        "duck_runs": [round(x, 3) for x in times["duck"]],
    }
    for arm in arms:
        m = statistics.median(times[arm])
        res[arm] = {
            "median_sec": round(m, 3),
            "ratio": round(m / d, 2),
            "runs": [round(x, 3) for x in times[arm]],
        }
    with open(OUT, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res))
    con.close()
    spark.stop()


if __name__ == "__main__":
    main()
