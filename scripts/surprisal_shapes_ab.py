"""l4_surprisal shape A/B (VERDICT r11 #1 — the one weak row, sf10 2.25x).

The r11 plan is anti-pattern-free (one tokenize pass via ReuseExchange,
map-side collapse, broadcast vocab + total), so the remaining cost is
the explode + two hash aggregates on STRING token keys. The verdict
names two candidate fixes; this measures both, plus their combination,
interleaved in ONE session against the current shape and the DuckDB
oracle under the exact BENCH_SF10 fetch protocol (toPandas, median of
N):

  A  current     — registry l4_surprisal: explode -> groupBy(doc_id, t)
                   map-side collapse -> tf via ReuseExchange ->
                   broadcast join -> doc agg. STRING keys everywhere.
  B  hash64      — same shape, but every aggregate/join keys on
                   xxhash64(t) computed right after the explode, so the
                   exchanges and hash tables work on one primitive
                   int64 instead of variable-length strings (verdict
                   candidate (a): "hash-agg longs, not strings").
  C  kernel      — per-doc token counting inside an Arrow mapInPandas
                   kernel (pandas str.split + groupby(size), the g1
                   np.unique discipline at doc grain): each output row
                   is a COMPLETE (doc_id, t, cd) count, so the
                   (doc_id, t) exchange disappears entirely — tf
                   aggregates kernel output, the doc agg collapses
                   map-side to one row per doc (verdict candidate (b)).
  D  kernel+hash — C's kernel, with B's int64 keys for the tf
                   aggregate and the broadcast join probe.

Exactness notes: B/D key on xxhash64 only INSIDE the computation —
token strings never reach the output, and on graded data the checksum
assertion below proves value-identity vs A. (At 100 TB vocab
cardinality a 64-bit key admits collisions, so promoting B/D would
need a collision story — flagged in the report; C has no such caveat:
pandas groupby counts are exact integers and the kernel emits partials
that downstream sums merge exactly, doc-split-safe.)

Usage:  python scripts/surprisal_shapes_ab.py [rounds]   (expects benchdata/sf10)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DST = os.path.join(ROOT, "benchdata", "sf10")


def _docs(spark):
    from kompactor_spark.tables import fan_out, load_table

    return fan_out(load_table(spark, DST, "documents"))


def shape_a(spark):
    from kompactor_spark.queries import all_queries

    return all_queries()["l4_surprisal"](spark, DST)


def shape_b(spark):
    from kompactor_spark.operators import text as X

    tok = (
        _docs(spark)
        .select("doc_id", F.explode(X.tokens("text")).alias("t"))
        .select("doc_id", F.xxhash64("t").alias("th"))
    )
    dt = tok.groupBy("doc_id", "th").agg(F.count("*").cast("double").alias("cd"))
    tf = dt.groupBy("th").agg(F.sum("cd").alias("c"))
    tot = tf.agg(F.sum("c").cast("double").alias("total"))
    return (
        dt.join(F.broadcast(tf), "th")
        .join(F.broadcast(tot))
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


def _kernel_counts(docs):
    """mapInPandas: documents -> exact per-doc (doc_id, t, cd) counts.

    Each input row is a whole document, so every output row is a
    complete per-doc count — no (doc_id, t) exchange is needed. Even if
    a doc's rows were ever split across partials, every downstream
    consumer is LINEAR in cd (tf sums it; the doc agg sums cd and
    cd*term), so partial merging stays exact.
    """

    def count(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            pdf = pdf.dropna(subset=["text"])
            if not len(pdf):
                continue
            toks = pdf["text"].str.split(" ")  # TOKEN_SPLIT, empties kept
            doc = np.repeat(pdf["doc_id"].to_numpy(), toks.str.len().to_numpy())
            flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
            g = (
                pd.DataFrame({"doc_id": doc, "t": flat})
                .groupby(["doc_id", "t"], sort=False)
                .size()
                .reset_index(name="cd")
            )
            g["cd"] = g["cd"].astype("float64")
            yield g

    return docs.select("doc_id", "text").mapInPandas(
        count, "doc_id bigint, t string, cd double"
    )


def _finish(dt, key):
    tf = dt.groupBy(key).agg(F.sum("cd").alias("c"))
    tot = tf.agg(F.sum("c").cast("double").alias("total"))
    return (
        dt.join(F.broadcast(tf), key)
        .join(F.broadcast(tot))
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


def shape_c(spark):
    return _finish(_kernel_counts(_docs(spark)), "t")


def shape_d(spark):
    dt = _kernel_counts(_docs(spark)).select(
        "doc_id", F.xxhash64("t").alias("th"), "cd"
    )
    return _finish(dt, "th")


def shape_b128(spark):
    """B with a collision-safe 128-bit key: two independent xxhash64
    lanes (the second salts the input with a constant column, giving a
    different 64-bit function). At 1e9 distinct tokens the corpus-wide
    collision probability is ~n^2/2^129 ~ 1.5e-21 — the same "exact by
    construction" class as the md5 content-hash dedup keys
    (l6_incremental_dedup). Group/join keys are two primitive longs."""
    from kompactor_spark.operators import text as X

    tok = (
        _docs(spark)
        .select("doc_id", F.explode(X.tokens("text")).alias("t"))
        .select(
            "doc_id",
            F.xxhash64("t").alias("th1"),
            F.xxhash64("t", F.lit(0x9E3779B9)).alias("th2"),
        )
    )
    dt = tok.groupBy("doc_id", "th1", "th2").agg(
        F.count("*").cast("double").alias("cd")
    )
    tf = dt.groupBy("th1", "th2").agg(F.sum("cd").alias("c"))
    tot = tf.agg(F.sum("c").cast("double").alias("total"))
    return (
        dt.join(F.broadcast(tf), ["th1", "th2"])
        .join(F.broadcast(tot))
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


def shape_b64g(spark):
    """B with a LOUD collision guard instead of a wider key: the group/
    join key stays ONE long (xxhash64), and a second independent 32-bit
    lane (murmur hash()) rides the aggregates as min/max — never as a
    key. If two distinct tokens ever shared the 64-bit key, their
    merged tf row would show min(g) != max(g) unless the 32-bit lane
    ALSO collides for the same pair (miss ~ 2^-96-class), and the check
    raises inside the plan before the vocab is consumed. Zero-cost on
    clean data: two primitive min/max aggregates + one codegen'd filter
    over vocab-sized rows."""
    from kompactor_spark.operators import text as X

    tok = (
        _docs(spark)
        .select("doc_id", F.explode(X.tokens("text")).alias("t"))
        .select("doc_id", F.xxhash64("t").alias("th"), F.hash("t").alias("g"))
    )
    dt = tok.groupBy("doc_id", "th").agg(
        F.count("*").cast("double").alias("cd"),
        F.min("g").alias("mn"),
        F.max("g").alias("mx"),
    )
    tf = (
        dt.groupBy("th")
        .agg(
            F.sum("cd").alias("c"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
        .where(
            F.when(F.col("mn") == F.col("mx"), F.lit(True)).otherwise(
                F.raise_error(
                    F.lit(
                        "l4_surprisal: xxhash64 token-key collision detected — "
                        "two distinct tokens share a 64-bit key; use the exact "
                        "string-keyed shape for this corpus"
                    )
                )
            )
        )
        .select("th", "c")
    )
    tot = tf.agg(F.sum("c").cast("double").alias("total"))
    return (
        dt.join(F.broadcast(tf), "th")
        .join(F.broadcast(tot))
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


SHAPES = {
    "A_current": shape_a,
    "B_hash64_keys": shape_b,
    "B128_two_lane_keys": shape_b128,
    "C_arrow_doc_kernel": shape_c,
    "D_kernel_plus_hash64": shape_d,
}
if os.environ.get("SURPRISAL_AB_B_ONLY"):
    SHAPES = {
        "A_current": shape_a,
        "B_hash64_keys": shape_b,
        "B128_two_lane_keys": shape_b128,
    }
if os.environ.get("SURPRISAL_AB_GUARD"):
    SHAPES = {
        "A_current": shape_a,
        "B_hash64_keys": shape_b,
        "B64G_guarded": shape_b64g,
    }


def checksum(spark, df):
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("doc_id") * 31 + F.col("n_tokens")).alias("s1"),
        F.sum(F.round(F.col("surprisal") * 1e6).cast("bigint")).alias("s2"),
    ).first()
    return (r["n"], int(r["s1"]), int(r["s2"]))


def fetch_time(df) -> float:
    t0 = time.perf_counter()
    pdf = df.toPandas()
    if len(pdf) < 0:
        raise AssertionError("unreachable")
    return time.perf_counter() - t0


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from kompactor_spark.queries import all_oracles
    from kompactor_spark.session import get_spark

    spark = get_spark("surprisal-ab")

    import duckdb

    con = duckdb.connect()
    con.execute("SET threads=4")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DST}/documents.parquet/*.parquet')"
    )
    oracle = all_oracles()["l4_surprisal"]

    # value-identity gate before any timing
    sums = {k: checksum(spark, fn(spark)) for k, fn in SHAPES.items()}
    print(f"checksums: {sums}", file=sys.stderr)
    if len(set(sums.values())) != 1:
        raise SystemExit(f"shape results differ: {sums}")

    # warm-ups (JIT + footer cache) then interleaved rounds
    for fn in SHAPES.values():
        fetch_time(fn(spark))
    duck_warm = fetch_time_duck(con, oracle)
    print(f"duck warm {duck_warm:.2f}s", file=sys.stderr)

    times: dict[str, list[float]] = {k: [] for k in SHAPES}
    times["duckdb"] = []
    for r in range(rounds):
        for k, fn in SHAPES.items():
            times[k].append(fetch_time(fn(spark)))
        times["duckdb"].append(fetch_time_duck(con, oracle))
        print(f"round {r}: " + json.dumps({k: round(v[-1], 3) for k, v in times.items()}), file=sys.stderr)

    med = {k: round(statistics.median(v), 3) for k, v in times.items()}
    d = med["duckdb"]
    out = {
        "rows": sums["A_current"][0],
        "medians_sec": med,
        "ratios_vs_duckdb": {k: round(v / d, 2) for k, v in med.items() if k != "duckdb"},
        "rounds": rounds,
        "protocol": "BENCH_SF10 fetch protocol, interleaved same-session, checksum-gated",
    }
    print(json.dumps(out))
    spark.stop()


def fetch_time_duck(con, sql: str) -> float:
    t0 = time.perf_counter()
    df = con.execute(sql).df()
    if len(df) < 0:
        raise AssertionError("unreachable")
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
