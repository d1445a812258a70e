"""j9 star-join shape A/B (round 13): map-side pre-aggregation of
lineitem by l_orderkey BEFORE the fact-fact shuffle.

The registry shape ships all |lineitem| (60M at sf10) 24-byte limb rows
through the l_orderkey exchange and probes orders per item row. But
lineitem parquet is clustered by l_orderkey (~4 items/order
contiguous), so a groupBy(l_orderkey) partial aggregate combines
map-side and the exchange carries ~|orders| rows instead — the join
output and every downstream dim probe shrink ~4x too. The round-7
negative pre-agg A/B was a DIFFERENT shape (by o_custkey, ABOVE the
join — it added a second full shuffle); this one reuses the join's own
key, so the agg exchange IS the join exchange.

Arms, interleaved per round in ONE session, identity-gated:
  A = registry shape (per-item rows through the shuffle)
  B = pre-agg by l_orderkey below the join
  D = DuckDB oracle (threads=4)

Usage:  python scripts/j9_preagg_ab.py [rounds] [sf_dir]
Writes scripts/j9_preagg_ab[_sfN]_out.json and prints one JSON line.
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
    return os.path.join(ROOT, "scripts", f"j9_preagg_ab{suffix}_out.json")


def j9_preagg_shape(spark, sf_dir):
    """Candidate: lineitem limb sums pre-aggregated per l_orderkey below
    the fact-fact join (map-side combine rides the SAME l_orderkey
    exchange the join needs)."""
    from pyspark.sql import functions as F

    from kompactor_spark import fixedpoint as fx
    from kompactor_spark.tables import loader

    T = loader(sf_dir, spark)
    r, n, c, o, l = T("region"), T("nation"), T("customer"), T("orders"), T("lineitem")
    dp4 = fx.to_units("l_extendedprice", 2) * (F.lit(100) - fx.to_units("l_discount", 2))
    hi, lo = fx.limb_split(dp4)
    l2 = (
        l.select("l_orderkey", hi.alias("rev_hi"), lo.alias("rev_lo"))
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("rev_hi").alias("rev_hi"),
            F.sum("rev_lo").alias("rev_lo"),
        )
    )
    o2 = o.select("o_orderkey", "o_custkey")
    return (
        l2.join(o2.hint("SHUFFLE_HASH"), l2.l_orderkey == o2.o_orderkey)
        .join(
            F.broadcast(c.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum("n_items").cast("bigint").alias("n_items"),
            fx.exact_sum("rev_hi", "rev_lo", 4).cast("double").alias("revenue"),
        )
        .orderBy("r_name", "n_name")
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(ROOT, "benchdata", "sf10")

    import duckdb

    from kompactor_spark.queries import all_oracles, all_queries
    from kompactor_spark.session import get_spark

    spark = get_spark("j9-preagg-ab")
    regs, oracles = all_queries(), all_oracles()
    arms = {"A_registry": regs["j9_star_join"], "B_preagg": j9_preagg_shape}

    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET threads=4")
    for t in ("region", "nation", "customer", "orders", "lineitem"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    sql = oracles["j9_star_join"]

    ref = arms["A_registry"](spark, sf_dir).toPandas()
    if not arms["B_preagg"](spark, sf_dir).toPandas().equals(ref):
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
