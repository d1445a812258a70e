"""l6 keyed-prefix shape A/B (round 13): the §7c audit's last four
hits — full-corpus windows PARTITIONed BY low-cardinality corpus keys
(source: 20 values, lang: 4) in the L6 pipeline ops:

  l6_pack_sequences      SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id)
  l6_cap_per_source      row_number per source, keep rn <= 50
  l6_weighted_mix        row_number per source in md5 order, keep rn <= k(source)
  l6_temperature_sample  row_number per lang   in md5 order, keep rn <= k(lang)

At today's scales these parallelize #keys-wide (20 tasks on 32 cores —
borderline); at 100 TB they serialize 20 half-TB sorts. Candidate
arms:

  B_keyed_prefix  operators/prefixsum.distributed_keyed_cumsums /
                  _row_number: range-partition on (key, order), window
                  over (pid, key), model-sized carry-ins (keys x pids)
                  broadcast back. For pack/mix/temperature.
  B_local_prune   (cap only) the rn <= 50 constant cap admits a
                  strictly cheaper two-phase top-k: an Arrow-batched
                  per-batch prune (every global top-50 row is in its
                  batch's top-50) then the keyed window over <= keys x
                  batches x 50 survivors.

Arms interleaved per round in ONE session, identity-gated vs the
registry output; DuckDB oracle timed in the same rounds.

Usage:  python scripts/l6_keyed_prefix_ab.py [rounds] [sf_dir]
Writes scripts/l6_keyed_prefix_ab[_sfN]_out.json, prints one JSON line.
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
    return os.path.join(ROOT, "scripts", f"l6_keyed_prefix_ab{suffix}_out.json")


# ---- candidate shapes ------------------------------------------------------


def pack_keyed_prefix(spark, sf_dir):
    from pyspark.sql import functions as F

    from kompactor_spark.operators import text as X
    from kompactor_spark.operators.prefixsum import distributed_keyed_cumsums
    from kompactor_spark.tables import loader

    t = loader(sf_dir, spark)("documents").select(
        "doc_id", "source", X.token_count("text").alias("n_tokens")
    )
    c = distributed_keyed_cumsums(t, ["source"], ["doc_id"], {"__cum": "n_tokens"})
    return (
        c.withColumn(
            "bin_id",
            F.floor((F.col("__cum") - F.col("n_tokens")) / F.lit(512.0)).cast("bigint"),
        )
        .select("source", "doc_id", "n_tokens", "bin_id")
        .orderBy("source", "doc_id")
    )


def cap_local_prune(spark, sf_dir):
    import pandas as pd
    from pyspark.sql import Window, functions as F

    from kompactor_spark.tables import loader

    base = loader(sf_dir, spark)("documents").select("doc_id", "source")

    def prune(it):
        for pdf in it:
            yield pdf.sort_values(["source", "doc_id"]).groupby("source", sort=False).head(50)

    loc = base.mapInPandas(prune, schema=base.schema)
    w = Window.partitionBy("source").orderBy("doc_id")
    return (
        loc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 50)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


def cap_keyed_prefix(spark, sf_dir):
    from pyspark.sql import functions as F

    from kompactor_spark.operators.prefixsum import distributed_keyed_row_number
    from kompactor_spark.tables import loader

    base = loader(sf_dir, spark)("documents").select("doc_id", "source")
    return (
        distributed_keyed_row_number(base, ["source"], ["doc_id"], "rn")
        .where(F.col("rn") <= 50)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


def mix_keyed_prefix(spark, sf_dir):
    from pyspark.sql import functions as F

    from kompactor_spark.operators.prefixsum import distributed_keyed_row_number
    from kompactor_spark.tables import loader

    docs = loader(sf_dir, spark)("documents")
    wt = F.when(F.substring("source", 4, 10).cast("int") % 2 == 0, F.lit(3.0)).otherwise(
        F.lit(1.0)
    )
    w = docs.groupBy("source").agg(
        F.first(wt).alias("wt"), F.count(F.lit(1)).cast("double").alias("cnt")
    )
    t = w.agg(F.min(F.col("cnt") / F.col("wt")).alias("t"))
    keep = w.crossJoin(F.broadcast(t)).select(
        "source", F.floor(F.col("wt") * F.col("t")).cast("bigint").alias("k")
    )
    h = F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string")))
    ranked = distributed_keyed_row_number(
        docs.select("doc_id", "source", h.alias("__h")), ["source"], ["__h", "doc_id"], "rn"
    )
    return (
        ranked.join(F.broadcast(keep), "source")
        .where(F.col("rn") <= F.col("k"))
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


def temperature_keyed_prefix(spark, sf_dir):
    from pyspark.sql import functions as F

    from kompactor_spark.operators.prefixsum import distributed_keyed_row_number
    from kompactor_spark.tables import loader

    docs = loader(sf_dir, spark)("documents")
    w = docs.groupBy("lang").agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    tot = w.agg(F.sum(F.pow("cnt", F.lit(0.3))).alias("z"), F.sum("cnt").alias("n"))
    keep = w.crossJoin(F.broadcast(tot)).select(
        "lang",
        "cnt",
        F.floor(F.lit(0.5) * F.col("n") * F.pow("cnt", F.lit(0.3)) / F.col("z"))
        .cast("bigint")
        .alias("k"),
    )
    h = F.md5(F.concat(F.lit("temp:"), F.col("doc_id").cast("string")))
    ranked = distributed_keyed_row_number(
        docs.select("doc_id", "lang", h.alias("__h")), ["lang"], ["__h", "doc_id"], "rn"
    )
    return (
        ranked.join(F.broadcast(keep), "lang")
        .where(F.col("rn") <= F.col("k"))
        .groupBy("lang")
        .agg(
            F.any_value("cnt").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("kept"),
            (F.round(F.count(F.lit(1)).cast("double") / F.any_value("cnt"), 6) + F.lit(0.0)).alias("keep_rate"),
        )
        .orderBy("lang")
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(ROOT, "benchdata", "sf10")

    import duckdb

    from kompactor_spark.queries import all_oracles, all_queries
    from kompactor_spark.session import get_spark

    spark = get_spark("l6-keyed-prefix-ab")
    regs, oracles = all_queries(), all_oracles()
    jobs = {
        "l6_pack_sequences": {"B_keyed_prefix": pack_keyed_prefix},
        "l6_cap_per_source": {
            "B_local_prune": cap_local_prune,
            "B_keyed_prefix": cap_keyed_prefix,
        },
        "l6_weighted_mix": {"B_keyed_prefix": mix_keyed_prefix},
        "l6_temperature_sample": {"B_keyed_prefix": temperature_keyed_prefix},
    }

    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET threads=4")
    p = os.path.join(sf_dir, "documents.parquet")
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{src}')")

    out = {
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "sf_dir": sf_dir,
        "rounds": rounds,
        "protocol": "interleaved same-session, identity-gated; construction untimed",
    }

    def time_engine(fn):
        df = fn(spark, sf_dir)
        t0 = time.perf_counter()
        pdf = df.toPandas()
        assert len(pdf) >= 0
        return time.perf_counter() - t0

    for qname, cands in jobs.items():
        arms = {"A_registry": regs[qname], **cands}
        ref = regs[qname](spark, sf_dir).toPandas()
        for a_name, fn in cands.items():
            got = fn(spark, sf_dir).toPandas()
            if not got.equals(ref):
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
        rec = {"duck_sec": round(d, 3), "duck_raw": [round(x, 3) for x in times["duck"]]}
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
