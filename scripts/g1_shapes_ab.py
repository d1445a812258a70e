"""g1_cooccurrence_graph shape A/B (VERDICT r10 #1).

g1 is the one >2x design-grade row (sf10 2.80x, 11.6 s vs 4.1 s) and
its "hash-agg throughput, not shape" explanation was asserted from one
plan reading. This measures the two candidate shapes the verdict named,
interleaved in ONE session against the current shape and the DuckDB
oracle, under the exact BENCH_SF10 LARGE_RESULT protocol (full parquet
sink, median of N):

  A  current   — act self-join on (h, event_type), u<v filter,
                 groupBy(u, v) two-bigint-key agg, sort, sink.
  B  packed    — same join, but the pair is packed into ONE int64
                 (u*2^32 + v — the limb-sum discipline applied to the
                 GROUP KEY) so the partial/final aggs hash one
                 primitive column; decode after the agg. Output order
                 on pk == (u, v) lexicographic since 0 <= v < 2^32.
  C  kernel    — groupBy bucket -> collect_list(user), then an Arrow
                 mapInPandas kernel expands each bucket's pairs in
                 numpy (packed int64) and PRE-AGGREGATES across the
                 whole batch with np.unique before anything leaves the
                 task (the batch_cosine discipline); final agg sums
                 model-sized partials.

All three produce identical (u, v, w) edge sets — asserted once before
timing via sort-insensitive checksum. DuckDB runs the registry oracle
in the same session (COPY to parquet sink, same protocol).

Usage:  python scripts/g1_shapes_ab.py [rounds]   (expects benchdata/sf10)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DST = os.path.join(ROOT, "benchdata", "sf10")
SINK = f"/tmp/g1_ab_sink_{os.getpid()}.parquet"
NS_PER_HOUR = 3_600_000_000_000
MIN_W = 2
PACK = 1 << 32


def _act(spark):
    from kompactor_spark.tables import load_table

    ev = load_table(spark, DST, "events")  # normalizes ts to ns bigint
    return ev.select(
        "user_id",
        (F.col("ts") - F.col("ts") % NS_PER_HOUR).alias("h"),
        "event_type",
    ).distinct()


def shape_a(spark):
    act = _act(spark)
    a = act.select(F.col("user_id").alias("u"), "h", "event_type")
    b = act.select(F.col("user_id").alias("v"), "h", "event_type")
    return (
        a.join(b, ["h", "event_type"])
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
        .where(F.col("w") >= MIN_W)
        .orderBy("u", "v")
    )


def shape_b(spark):
    act = _act(spark)
    a = act.select(F.col("user_id").alias("u"), "h", "event_type")
    b = act.select(F.col("user_id").alias("v"), "h", "event_type")
    pk = (F.col("u") * F.lit(PACK) + F.col("v")).alias("pk")
    packed = (
        a.join(b, ["h", "event_type"])
        .where(F.col("u") < F.col("v"))
        .select(pk)
        .groupBy("pk")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
        .where(F.col("w") >= MIN_W)
        .orderBy("pk")
    )
    return packed.select(
        (F.col("pk") / PACK).cast("bigint").alias("u"),
        (F.col("pk") % PACK).alias("v"),
        "w",
    )


def shape_c(spark):
    buckets = (
        _act(spark)
        .groupBy("h", "event_type")
        .agg(F.collect_list("user_id").alias("us"))
        .select("us")
    )

    def expand(batches):
        import numpy as np
        import pandas as pd

        tri = {}  # per-list-length cached upper-triangle index pairs
        for pdf in batches:
            chunks = []
            for us in pdf["us"]:
                c = len(us)
                if c < 2:
                    continue
                if c not in tri:
                    tri[c] = np.triu_indices(c, k=1)
                a = np.sort(np.asarray(us, dtype=np.int64))
                i, j = tri[c]
                chunks.append(a[i] * PACK + a[j])
            if not chunks:
                continue
            pk, cnt = np.unique(np.concatenate(chunks), return_counts=True)
            yield pd.DataFrame({"pk": pk, "w": cnt})

    partial = buckets.mapInPandas(expand, "pk bigint, w bigint")
    edges = (
        partial.groupBy("pk")
        .agg(F.sum("w").cast("bigint").alias("w"))
        .where(F.col("w") >= MIN_W)
        .orderBy("pk")
    )
    return edges.select(
        (F.col("pk") / PACK).cast("bigint").alias("u"),
        (F.col("pk") % PACK).alias("v"),
        "w",
    )


def _kernel_edges(buckets):
    """Shared Arrow pair-expansion kernel over a bucket user-list frame."""

    def expand(batches):
        import numpy as np
        import pandas as pd

        tri = {}
        for pdf in batches:
            chunks = []
            for us in pdf["us"]:
                c = len(us)
                if c < 2:
                    continue
                if c not in tri:
                    tri[c] = np.triu_indices(c, k=1)
                a = np.sort(np.asarray(us, dtype=np.int64))
                i, j = tri[c]
                chunks.append(a[i] * PACK + a[j])
            if not chunks:
                continue
            pk, cnt = np.unique(np.concatenate(chunks), return_counts=True)
            yield pd.DataFrame({"pk": pk, "w": cnt})

    partial = buckets.mapInPandas(expand, "pk bigint, w bigint")
    edges = (
        partial.groupBy("pk")
        .agg(F.sum("w").cast("bigint").alias("w"))
        .where(F.col("w") >= MIN_W)
        .orderBy("pk")
    )
    return edges.select(
        (F.col("pk") / PACK).cast("bigint").alias("u"),
        (F.col("pk") % PACK).alias("v"),
        "w",
    )


def shape_d(spark):
    """Single-exchange variant: collect_set directly on the raw bucket
    grain — the distinct is folded into the set aggregation, so the
    whole build is ONE shuffle (partial sets merge map-side) instead of
    distinct's exchange + the list agg's exchange."""
    from kompactor_spark.tables import load_table

    ev = load_table(spark, DST, "events")
    buckets = (
        ev.select(
            "user_id",
            (F.col("ts") - F.col("ts") % NS_PER_HOUR).alias("h"),
            "event_type",
        )
        .groupBy("h", "event_type")
        .agg(F.collect_set("user_id").alias("us"))
        .select("us")
    )
    return _kernel_edges(buckets)


SHAPES = {"A_current": shape_a, "B_packed_key": shape_b, "C_arrow_kernel": shape_c}
if os.environ.get("G1_AB_CD"):
    SHAPES = {"C_arrow_kernel": shape_c, "D_collect_set": shape_d}


def checksum(df):
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("u") * 31 + F.col("v") * 7 + F.col("w")).alias("s"),
    ).first()
    return (r["n"], int(r["s"]))


def sink_time(df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").parquet(SINK)
    dt = time.perf_counter() - t0
    shutil.rmtree(SINK, ignore_errors=True)
    return dt


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    import duckdb

    from kompactor_spark.queries import all_oracles
    from kompactor_spark.session import get_spark

    spark = get_spark("g1-shapes-ab")

    # correctness gate: all three shapes produce the identical edge set
    sums = {name: checksum(fn(spark)) for name, fn in SHAPES.items()}
    print(json.dumps({"checksums": {k: list(v) for k, v in sums.items()}}), flush=True)
    if len(set(sums.values())) != 1:
        raise SystemExit(f"shape outputs diverge: {sums}")

    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET threads=4")
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{DST}/events.parquet')"
    )
    oracle = all_oracles()["g1_cooccurrence_graph"]
    dsink = f"/tmp/g1_ab_duck_{os.getpid()}.parquet"

    def duck_run() -> float:
        t0 = time.perf_counter()
        con.execute(f"COPY ({oracle}) TO '{dsink}' (FORMAT PARQUET)")
        dt = time.perf_counter() - t0
        os.remove(dsink)
        return dt

    # warm-up, then interleave: A, B, C, duck per round
    for fn in SHAPES.values():
        sink_time(fn(spark))
    duck_run()

    times: dict[str, list[float]] = {k: [] for k in [*SHAPES, "duckdb"]}
    for r in range(rounds):
        for name, fn in SHAPES.items():
            dt = sink_time(fn(spark))
            times[name].append(dt)
            print(json.dumps({"round": r, "shape": name, "sec": round(dt, 3)}), flush=True)
        dt = duck_run()
        times["duckdb"].append(dt)
        print(json.dumps({"round": r, "shape": "duckdb", "sec": round(dt, 3)}), flush=True)

    med = {k: round(statistics.median(v), 3) for k, v in times.items()}
    med["ratio_current"] = round(med["A_current"] / med["duckdb"], 2)
    med["ratio_packed"] = round(med["B_packed_key"] / med["duckdb"], 2)
    med["ratio_kernel"] = round(med["C_arrow_kernel"] / med["duckdb"], 2)
    print(json.dumps({"medians": med}), flush=True)


if __name__ == "__main__":
    main()
