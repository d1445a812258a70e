"""Round-15: per-job decomposition of l2_dedup_clusters_collapsed.

The end-of-round windows read the row at 2.59/3.36 s (ratio 1.31/1.51)
— the largest engine-side sf1 row still above ~1.5x that is not a
documented floor class. Same methodology as the m11/surprisal
decompositions (scripts/r15_decompose.py): noop-sink timing per nested
subtree (guide §1.4), job count per layer (statusTracker over a job
group), full query under its bench protocol (eager construct). The
increments between nested layers attribute the cost; the job counts say
how much is launch floor.

Layers (each includes the previous):
  mapped  — window min(doc_id) over text (one full shuffle on text)
  pairs   — the arrow shingle-pair kernel over the representatives
  labels  — star-CC over the pairs (driver union-find short-circuit)
  full    — broadcast label join + doc_id range sort (bench protocol)

Usage:  python scripts/r15_clusters_decompose.py [runs]
Writes scripts/r15_clusters_decompose_out.json and prints one JSON line.
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
OUT = os.path.join(ROOT, "scripts", "r15_clusters_decompose_out.json")


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(fn, runs: int) -> dict:
    fn()  # warm-up
    xs = [None] * runs
    for i in range(runs):
        t0 = time.perf_counter()
        fn()
        xs[i] = time.perf_counter() - t0
    return {"median_sec": round(statistics.median(xs), 3), "runs": [round(x, 3) for x in xs]}


def count_jobs(spark, fn) -> int:
    sc = spark.sparkContext
    group = f"r15-clusters-{time.monotonic_ns()}"
    sc.setJobGroup(group, "job count probe")
    try:
        fn()
    finally:
        sc.setJobGroup(None, None)
    return len(sc.statusTracker().getJobIdsForGroup(group))


def layers(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kompactor_spark.operators import dedup as D
    from kompactor_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("text")
    mapped = docs.select(
        "doc_id", "text", F.min("doc_id").over(w).alias("rep_id")
    ).localCheckpoint(eager=False)
    reps = mapped.where(F.col("doc_id") == F.col("rep_id")).select("doc_id", "text")
    pairs = D.jaccard_pairs(reps, threshold=0.12)
    labels = D.dedup_clusters_star(pairs, reps.select("doc_id")).withColumnRenamed(
        "doc_id", "rep_id"
    )
    return {
        "mapped": lambda: noop(mapped.select("doc_id", "rep_id")),
        "pairs": lambda: noop(pairs),
        "labels": lambda: noop(labels),
    }


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    from kompactor_spark.queries import all_queries
    from kompactor_spark.session import get_spark

    spark = get_spark("r15-clusters-decompose")
    fn = all_queries()["l2_dedup_clusters_collapsed"]

    def full_eager():
        pdf = fn(spark, SF1).toPandas()
        assert len(pdf) >= 0

    entry: dict = {
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "runs": runs,
    }
    spark.sparkContext.setJobDescription("r15-clusters-decompose:full")
    entry["full_eager"] = timed(full_eager, runs)
    entry["n_jobs_full"] = count_jobs(spark, full_eager)
    for name, thunk in layers(spark, SF1).items():
        # layers() rebuilt per timing run so each localCheckpoint is fresh
        spark.sparkContext.setJobDescription(f"r15-clusters-decompose:{name}")
        entry[name] = timed(lambda n=name: layers(spark, SF1)[n](), runs)
        entry[f"n_jobs_{name}"] = count_jobs(spark, lambda n=name: layers(spark, SF1)[n]())

    with open(OUT, "w") as fh:
        json.dump(entry, fh, indent=1)
    print(json.dumps(entry))
    spark.stop()


if __name__ == "__main__":
    main()
