"""m11_basket_lift sf1 shape A/B (round 13 — the two-round rule fired).

m11 measured over 2x at sf1 in three consecutive independent windows
(judge r12: 2.92x; r13 remeasure: 3.27x / 2.53x) while holding 0.90x at
sf10. The executed sf1 plan shows why: AQE picks a BROADCAST hash join
for the basket self-join and broadcasts the ~6M-row distinct
(orderkey, partkey) side — a driver-sized hash relation build per run,
and a 100 TB hazard class (never broadcast a corpus-sized side).

Arms, interleaved per round in ONE session, identity-gated first:
  A = registry shape (distinct -> self-join -> pair agg; AQE broadcast)
  B = g1 pair-kernel shape: collect_set per order (dedup folded into
      the one orderkey shuffle), Arrow triu pair expansion with
      np.unique partials (queries/graph._pair_count_kernel), supports
      via per-part countDistinct(orderkey) — no join for pairs at all
  C = A + .hint("shuffle_hash") on the self-join (co-partitioned hash
      join instead of the broadcast; the minimal pin)
  D = DuckDB oracle (threads=4), same window

Usage:  python scripts/m11_shape_ab.py [rounds] [sf_dir]
Writes scripts/m11_shape_ab_out.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _out_path(sf_dir: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/"))
    suffix = "" if tag == "sf1" else f"_{tag}"
    return os.path.join(ROOT, "scripts", f"m11_shape_ab{suffix}_out.json")


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
            "p1", "p2", "both", "s1", "s2",
            F.round(both_d / F.col("n_orders"), 6).alias("support"),
            F.round(both_d / F.col("s1"), 6).alias("confidence"),
            F.round(
                both_d * F.col("n_orders") / (F.col("s1").cast("double") * F.col("s2")), 6
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "p1", "p2")
        .limit(25)
    )


def m11_kernel_shape(spark, sf_dir):
    """Arm B — the g1 discipline applied to baskets."""
    from pyspark.sql import functions as F

    from kompactor_spark.queries import graph as G
    from kompactor_spark.tables import loader

    li = loader(sf_dir, spark)("lineitem").select("l_orderkey", "l_partkey")
    buckets = (
        li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("us")).select("us")
    )
    pairs = G._pair_count_kernel(buckets, _MIN).select(
        F.col("u").alias("p1"), F.col("v").alias("p2"), F.col("w").alias("both")
    )
    sup = li.groupBy("l_partkey").agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("s")
    )
    n = li.agg(F.countDistinct("l_orderkey").cast("bigint").alias("n_orders"))
    return _finish(pairs, sup, n)


def m11_shuffle_hash_shape(spark, sf_dir):
    """Arm C — registry shape with the broadcast pinned away."""
    from pyspark.sql import functions as F

    from kompactor_spark.tables import loader

    li = loader(sf_dir, spark)("lineitem").select("l_orderkey", "l_partkey").distinct()
    n = li.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )
    sup = li.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("bigint").alias("s"))
    a = li.select("l_orderkey", F.col("l_partkey").alias("p1"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("p2"))
    pairs = (
        a.join(b.hint("shuffle_hash"), "l_orderkey")
        .where(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("both"))
        .where(F.col("both") >= _MIN)
    )
    return _finish(pairs, sup, n)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(ROOT, "benchdata", "sf1")

    import duckdb

    from kompactor_spark.queries import all_oracles, all_queries
    from kompactor_spark.session import get_spark

    spark = get_spark("m11-shape-ab")
    regs, oracles = all_queries(), all_oracles()
    arms = {
        "A_registry": regs["m11_basket_lift"],
        "B_kernel": m11_kernel_shape,
        "C_shuffle_hash": m11_shuffle_hash_shape,
    }

    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET threads=4")
    p = os.path.join(sf_dir, "lineitem.parquet")
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{src}')")
    sql = oracles["m11_basket_lift"]

    # identity gate
    ref = arms["A_registry"](spark, sf_dir).toPandas()
    for name, fn in arms.items():
        got = fn(spark, sf_dir).toPandas()
        if not got.equals(ref):
            raise SystemExit(f"{name}: output differs from registry — A/B void")
    t0 = time.perf_counter()
    con.execute(sql).df()
    print(f"identity gate passed; duck warm {time.perf_counter() - t0:.2f}s",
          file=sys.stderr)

    def time_engine(fn):
        # EAGER protocol (m11 is in bench.py SF1_EAGER_CONSTRUCT)
        t0 = time.perf_counter()
        pdf = fn(spark, sf_dir).toPandas()
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
        "protocol": (
            "interleaved same-session arms, identity-gated vs the registry "
            "output first; EAGER timing (construction inside)"
        ),
    }
    for name in arms:
        m = statistics.median(times[name])
        out[name] = {
            "sec": round(m, 3),
            "ratio": round(m / d, 3),
            "raw": [round(x, 3) for x in times[name]],
        }
    out["duck_raw"] = [round(x, 3) for x in times["duck"]]
    with open(_out_path(sf_dir), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    con.close()
    spark.stop()


if __name__ == "__main__":
    main()
