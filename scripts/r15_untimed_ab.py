"""Round-15: barrier A/Bs for the untimed doubled regions (VERDICT r14
"Next round" #5 / OPTIMIZATION_r14 "Not yet optimized").

m1_upsert, m6_snapshot_diff, q11_important_parts, q20_part_promotion
and l3g_pq_codebook each end in a global orderBy whose range-bounds
sampling re-executes the subtree below (the round-14 mechanism). None
sits on a timed bench surface, so round 14 deferred them. This A/B
measures the barrier shape for each (hash-repartition on the sort key
at the NARROWEST point — after the selective filter / the final join —
so the barrier shuffles the OUTPUT rows, not the working set) against
the registry shape, interleaved in one session, identity-gated.

Expected split, from the r14 negative arms (f7/j14: barrier loses when
output bytes >= re-scan cost) and the broadcast-relation-reuse caveat
(a re-executed child does NOT rebuild broadcast relations — only the
streamed side re-runs):
  m1: output = full orders table (barrier shuffles 100%); doubled
      region = 3 orders scans + anti probe — could go either way.
  m6: doubled region = the full-outer SMJ re-merge; output is the
      ~2% mismatch rows — barrier should win.
  q11/l3g: doubled region = agg-final + broadcast probes over
      materialized exchanges (cheap class); output tiny — near-wash,
      measured to close the checklist.
  q20: streamed side is just the supplier scan (broadcasts cached) —
      near-wash expected; measured to close the checklist.

Usage:  python scripts/r15_untimed_ab.py [rounds] [sf_dir]
Writes scripts/r15_untimed_ab_out.json and prints one JSON line.
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
OUT = os.path.join(ROOT, "scripts", "r15_untimed_ab_out.json")


def _b_m1(spark, sf_dir):
    from pyspark.sql import functions as F

    from kompactor_spark.tables import loader

    T = loader(sf_dir, spark)
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    target = T("orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    updates = (
        T("orders")
        .where(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.round(F.col("o_totalprice") * 1.1, 2).alias("o_totalprice"),
        )
    )
    inserts = (
        T("orders")
        .where(F.col("o_orderkey") % 1000 == 0)
        .select(
            (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
            "o_custkey",
            F.lit("N").alias("o_orderstatus"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
    )
    changes = updates.unionByName(inserts)
    kept = target.join(changes.select("o_orderkey"), "o_orderkey", "left_anti")
    return (
        kept.select(*cols)
        .unionByName(changes.select(*cols))
        .repartition("o_orderkey")  # barrier below the presentation sort
        .orderBy("o_orderkey")
    )


def _b_m6(spark, sf_dir):
    from pyspark.sql import functions as F

    from kompactor_spark.tables import loader

    T = loader(sf_dir, spark)
    orders = T("orders").select("o_orderkey")
    old = orders.where(F.col("o_orderkey") % 97 != 0).withColumnRenamed("o_orderkey", "old_key")
    new = orders.where(F.col("o_orderkey") % 89 != 0).withColumnRenamed("o_orderkey", "new_key")
    return (
        old.join(new, old.old_key == new.new_key, "full")
        .where(F.col("old_key").isNull() | F.col("new_key").isNull())
        .select(
            F.coalesce("old_key", "new_key").alias("o_orderkey"),
            F.when(F.col("old_key").isNull(), "added").otherwise("removed").alias("op"),
        )
        .repartition("o_orderkey")  # barrier: only the ~2% diff rows shuffle
        .orderBy("o_orderkey")
    )


def _b_q11(spark, sf_dir):
    from pyspark.sql import functions as F

    from kompactor_spark.queries.tpch import dec
    from kompactor_spark.session import dim_broadcast
    from kompactor_spark.tables import loader

    T = loader(sf_dir, spark)
    s = (
        T("supplier")
        .join(
            F.broadcast(T("nation").where(F.col("n_name") == "NATION_7")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    val = (
        T("lineitem")
        .join(dim_broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(dec("l_extendedprice")).alias("value_dec"))
    )
    total = val.agg(F.sum("value_dec").alias("total_dec"))
    return (
        val.join(F.broadcast(total))
        .where(
            F.col("value_dec").cast("decimal(18,2)") * F.lit(1000).cast("decimal(4,0)")
            > F.col("total_dec")
        )
        .select("l_partkey", F.col("value_dec").cast("double").alias("part_value"))
        .repartition("part_value", "l_partkey")  # barrier on the filtered rows
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


def _b_q20(spark, sf_dir):
    from pyspark.sql import functions as F

    from kompactor_spark.session import dim_broadcast
    from kompactor_spark.tables import loader

    T = loader(sf_dir, spark)
    red = T("part").where(F.col("p_name").like("red%")).select("p_partkey")
    heavy = (
        T("lineitem")
        .where(
            (F.col("l_shipdate") >= "1996-01-01 00:00:00")
            & (F.col("l_shipdate") < "1997-01-01 00:00:00")
        )
        .join(dim_broadcast(red), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
        .where(F.col("qty") > F.lit(50).cast("decimal(18,2)"))
        .select("l_suppkey")
    )
    n = T("nation").where(F.col("n_name") == "NATION_3")
    return (
        T("supplier")
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name")
        .repartition("s_name")  # barrier on the few surviving suppliers
        .orderBy("s_name")
    )


def _b_l3g(spark, sf_dir):
    from pyspark.sql import functions as F

    from kompactor_spark.operators import cluster as C
    from kompactor_spark.tables import loader

    T = loader(sf_dir, spark)
    emb = T("embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    a2, m1 = C.pq_codebook(emb, n_sub=8, k=16)
    norms = m1.groupBy("sub", "code").agg(
        F.sqrt(F.sum(F.col("cd") * F.col("cd"))).alias("nrm")
    )
    return (
        a2.groupBy("sub", "code")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs"))
        .join(norms, ["sub", "code"])
        .select(
            "sub",
            "code",
            "n_vecs",
            (F.round("nrm", 6) + F.lit(0.0)).alias("centroid_norm"),
        )
        .repartition("sub", "code")  # barrier: 128 rows
        .orderBy("sub", "code")
    )


CASES = {
    "m1_upsert": _b_m1,
    "m6_snapshot_diff": _b_m6,
    "q11_important_parts": _b_q11,
    "q20_part_promotion": _b_q20,
    "l3g_pq_codebook": _b_l3g,
}


def _duck_connect(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET threads=4")
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    return con


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else SF1

    from kompactor_spark.oracle import compare_frames
    from kompactor_spark.queries import all_oracles, all_queries
    from kompactor_spark.session import get_spark

    spark = get_spark("r15-untimed-ab")
    regs, oracles = all_queries(), all_oracles()
    con = _duck_connect(sf_dir)

    res: dict = {
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "rounds": rounds,
        "sf_dir": sf_dir,
    }
    for name, b_fn in CASES.items():
        a_fn = regs[name]
        sql = oracles[name]
        duck_pdf = con.execute(sql).df()
        got_a = a_fn(spark, sf_dir).toPandas()
        got_b = b_fn(spark, sf_dir).toPandas()
        cmp = compare_frames(name, got_b, duck_pdf)
        if not cmp.ok:
            raise SystemExit(f"{name}/B: oracle gate FAILED: {cmp.detail}")
        if not got_b.equals(got_a):
            raise SystemExit(f"{name}/B: differs from registry output — A/B void")
        print(f"{name}: identity gates passed", file=sys.stderr)

        def timer(fn):  # lazy protocol: fresh plan, timed fetch
            df = fn(spark, sf_dir)
            t0 = time.perf_counter()
            pdf = df.toPandas()
            assert len(pdf) >= 0
            return time.perf_counter() - t0

        ta, tb = [], []
        timer(a_fn)
        timer(b_fn)  # warm-ups
        for r in range(rounds):
            spark.sparkContext.setJobDescription(f"r15-untimed:{name}:A:r{r}")
            ta.append(timer(a_fn))
            spark.sparkContext.setJobDescription(f"r15-untimed:{name}:B:r{r}")
            tb.append(timer(b_fn))
        entry = {
            "A_registry": {
                "median_sec": round(statistics.median(ta), 3),
                "runs": [round(x, 3) for x in ta],
            },
            "B_barrier": {
                "median_sec": round(statistics.median(tb), 3),
                "runs": [round(x, 3) for x in tb],
            },
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
