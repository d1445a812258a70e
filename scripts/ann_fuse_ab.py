"""A/B: fused query-batch fetch vs dedicated Spark collect (VERDICT r12 #3).

l7_knn_classify (1.94x) and l3_batch_topk (1.89x) straddled the 2x bar
at sf10 on ~1 s absolute rows whose r11 decomposition was ~0.099 s
empty-job floor + ~0.134 s query-vector collect + ~1.24 s kernel. The
pre-committed fix: stop paying a dedicated Spark job to fetch the
8-vector constant query batch — read it with one pyarrow
row-group-pruned scan (_query_vec_batch), the same "driver-side model
state" discipline as the IVF centroids.

Arms, interleaved per round in ONE session (VM ambient drift rule):
  A = the FULL round-12 shape: dedicated Spark collect for the query
      batch + the r12 mapInPandas kernel (frozen copy below)
  B = the round-13 registry shape: fused pyarrow fetch + the
      mapInArrow kernel (flat-buffer reshape, partition-then-sort topk)
  D = the DuckDB oracle (same-window control, threads=4)
Timed = full construction + toPandas (EAGER protocol — the fetch IS
construction-time work; excluding it would hide the thing under test).

Usage:  python scripts/ann_fuse_ab.py [rounds]
Writes scripts/ann_fuse_ab_out.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF10 = os.path.join(ROOT, "benchdata", "sf10")
OUT = os.path.join(ROOT, "scripts", "ann_fuse_ab_out.json")


def _old_batch_cosine_candidates(df, queries, k, id_col="vec_id",
                                 vec_col="embedding", payload_cols=()):
    """FROZEN copy of the round-12 mapInPandas kernel (the pre-rewrite
    simsearch.batch_cosine_candidates) so arm A measures the true r12
    end-to-end shape in the same window as arm B."""
    import numpy as np
    from pyspark.sql import functions as F  # noqa: F401

    if not queries:
        raise ValueError("batch_cosine_candidates: empty query batch")
    dims = {len(v) for _, v in queries}
    (dim,) = dims
    qids = [int(qid) for qid, _ in queries]
    qmat = [[float(x) for x in v] for _, v in queries]
    id_t = df.schema[id_col].dataType.simpleString()
    payload_schema = "".join(
        f", {c} {df.schema[c].dataType.simpleString()}" for c in payload_cols
    )
    out_schema = f"query_id bigint, {id_col} {id_t}{payload_schema}, cosine double"
    cols = [id_col, *payload_cols, vec_col]

    def run(batches):
        import numpy as np

        Q = np.asarray(qmat, dtype=np.float64)
        qn = np.sqrt((Q * Q).sum(axis=1))
        qid_arr = np.asarray(qids)
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = pdf[vec_col].to_numpy()
            lens = np.fromiter(
                (-1 if v is None else len(v) for v in vecs),
                dtype=np.int64, count=len(vecs),
            )
            ok = lens == dim
            if not ok.all():
                pdf = pdf.iloc[np.flatnonzero(ok)]
                vecs = pdf[vec_col].to_numpy()
                if not len(pdf):
                    continue
            V = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
            nv = np.sqrt((V * V).sum(axis=1))
            if not (nv > 0.0).all():
                keep = np.flatnonzero(nv > 0.0)
                if not len(keep):
                    continue
                pdf = pdf.iloc[keep]
                V, nv = V[keep], nv[keep]
            S = (V @ Q.T) / np.outer(nv, qn)
            n = len(pdf)
            kk = min(k, n)
            out = {"query_id": [], id_col: [], **{c: [] for c in payload_cols}, "cosine": []}
            ids = pdf[id_col].to_numpy()
            for j in range(len(qids)):
                col = S[:, j]
                cand = np.lexsort((ids, -col))[:kk]
                out["query_id"].extend([qid_arr[j]] * len(cand))
                out[id_col].extend(ids[cand])
                for c in payload_cols:
                    out[c].extend(pdf[c].to_numpy()[cand])
                out["cosine"].extend(col[cand])
            import pandas as pd

            yield pd.DataFrame(out)

    return df.select(*cols).mapInPandas(run, out_schema)


def _old_queries(spark, sf_dir):
    """The round-12 query-batch fetch: a dedicated Spark collect job."""
    from pyspark.sql import functions as F

    from kompactor_spark.tables import loader

    emb = loader(sf_dir, spark)("embeddings")
    return [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in emb.where(F.col("vec_id") < 8).select("vec_id", "embedding").collect()
    ]


def _knn_from(queries_fn, kernel):
    def fn(spark, sf_dir):
        from pyspark.sql import Window, functions as F

        from kompactor_spark.operators import simsearch as S
        from kompactor_spark.tables import loader

        emb = loader(sf_dir, spark)("embeddings")
        cand = kernel(
            emb.where(F.col("vec_id") >= 8), queries_fn(spark, sf_dir), k=10,
            payload_cols=("label",),
        )
        rn = F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "vec_id")
        )
        votes = (
            cand.withColumn("rn", rn)
            .where(F.col("rn") <= 10)
            .groupBy("query_id", "label")
            .agg(F.count(F.lit(1)).cast("bigint").alias("votes"))
        )
        vr = F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.col("votes").desc(), F.col("label").asc())
        )
        return (
            votes.withColumn("vr", vr)
            .where(F.col("vr") == 1)
            .select("query_id", F.col("label").alias("pred_label"), "votes")
            .orderBy("query_id")
        )

    return fn


def _batch_from(queries_fn, kernel):
    def fn(spark, sf_dir):
        from pyspark.sql import Window, functions as F

        from kompactor_spark.operators import simsearch as S
        from kompactor_spark.tables import loader

        emb = loader(sf_dir, spark)("embeddings")
        cand = kernel(
            emb, queries_fn(spark, sf_dir), k=6
        ).where(F.col("vec_id") != F.col("query_id"))
        rn = F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "vec_id")
        )
        return (
            cand.withColumn("rn", rn)
            .where(F.col("rn") <= 5)
            .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"))
            .orderBy("query_id", F.col("cosine").desc(), "vec_id")
        )

    return fn


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    import duckdb

    from kompactor_spark.queries import all_oracles, all_queries
    from kompactor_spark.session import get_spark

    spark = get_spark("ann-fuse-ab")
    regs, oracles = all_queries(), all_oracles()

    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute("SET threads=4")
    path = os.path.join(SF10, "embeddings.parquet")
    src = f"{path}/*.parquet" if os.path.isdir(path) else path
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{src}')")

    arms = {
        "l7_knn_classify": {
            "A_collect": _knn_from(_old_queries, _old_batch_cosine_candidates),
            "B_fused": regs["l7_knn_classify"],
        },
        "l3_batch_topk": {
            "A_collect": _batch_from(_old_queries, _old_batch_cosine_candidates),
            "B_fused": regs["l3_batch_topk"],
        },
    }

    def time_engine(fn):
        t0 = time.perf_counter()
        pdf = fn(spark, SF10).toPandas()
        assert len(pdf) >= 0
        return time.perf_counter() - t0

    def time_duck(sql):
        t0 = time.perf_counter()
        assert len(con.execute(sql).df()) >= 0
        return time.perf_counter() - t0

    # identity gate: both arms must produce identical frames at sf10
    for q, a in arms.items():
        pa = a["A_collect"](spark, SF10).toPandas()
        pb = a["B_fused"](spark, SF10).toPandas()
        if not pa.equals(pb):
            raise SystemExit(f"{q}: arm outputs differ — A/B void")
        time_duck(oracles[q])  # control warm-up

    times: dict[str, dict[str, list[float]]] = {
        q: {"A_collect": [], "B_fused": [], "duck": []} for q in arms
    }
    for r in range(rounds):
        for q, a in arms.items():
            times[q]["A_collect"].append(time_engine(a["A_collect"]))
            times[q]["B_fused"].append(time_engine(a["B_fused"]))
            times[q]["duck"].append(time_duck(oracles[q]))
        print(f"round {r + 1}/{rounds} done", file=sys.stderr)

    out = {
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "sf": 10,
        "rounds": rounds,
        "protocol": (
            "interleaved same-session arms (A=r12 collect, B=r13 fused pyarrow "
            "fetch, D=DuckDB threads=4 control); timed = full construction + "
            "toPandas (EAGER); identity-gated A==B at sf10 before timing"
        ),
    }
    for q in arms:
        a = statistics.median(times[q]["A_collect"])
        b = statistics.median(times[q]["B_fused"])
        d = statistics.median(times[q]["duck"])
        out[q] = {
            "A_collect_sec": round(a, 3),
            "B_fused_sec": round(b, 3),
            "duck_sec": round(d, 3),
            "ratio_A": round(a / d, 3),
            "ratio_B": round(b / d, 3),
            "raw": {k: [round(x, 3) for x in v] for k, v in times[q].items()},
        }
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    con.close()
    spark.stop()


if __name__ == "__main__":
    main()
