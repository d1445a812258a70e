"""Round-15 sf10 scaling pair (VERDICT r14 #6): the sf1 scaling block
reads ~1.0 for 8 of 14 rows and <1 for g3/l7g because sf1 rows are
floor-dominated — measure the same low-core/high-core pair ONCE at sf10
where parallelism can express, for the largest rows.

One invocation = one core count (SPARK_GRAFT_CPUS drives the master,
exactly like bench.py). The merged table goes to SCALE.md. The AQE
partition-coalescing half of the verdict item (task counts at small vs
large SF) is recorded by the companion r15_scaling_aqe_probe.py.

Usage:  SPARK_GRAFT_CPUS=N python scripts/r15_scaling_sf10.py [runs]
Appends one JSON line to scripts/r15_scaling_sf10_runs.jsonl.
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
OUT = os.path.join(ROOT, "scripts", "r15_scaling_sf10_runs.jsonl")

ROWS = [
    ("j19_nearest_value_join", "sink"),   # 30 s: broadcast band join + local sort
    ("m11_basket_lift", "eager"),         # 23 s: collect_set + pair kernel
    ("j14_binned_interval_join", "sink"), # 13 s: binned range join
    ("g3_pagerank", "eager"),             # 7 s: 3 iterations, tiny jobs
    ("x23_max_concurrency", "lazy"),      # 5 s: bucketed sweep-line
    ("l2_dedup_clusters_collapsed", "eager"),  # 3 s: kernel + CC
]


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    import shutil
    import tempfile

    from kompactor_spark.queries import all_queries
    from kompactor_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    spark = get_spark(f"r15-scaling-{cpus}")
    regs = all_queries()
    sink = os.path.join(tempfile.gettempdir(), "r15_scaling_sink.parquet")

    entry: dict = {"cpus": cpus, "t": time.strftime("%H:%M:%SZ", time.gmtime())}
    for name, proto in ROWS:
        fn = regs[name]
        spark.sparkContext.setJobDescription(f"r15-scaling:{cpus}:{name}")

        def one() -> float:
            if proto == "eager":
                t0 = time.perf_counter()
                pdf = fn(spark, SF10).toPandas()
                assert len(pdf) >= 0
                return time.perf_counter() - t0
            if proto == "sink":
                df = fn(spark, SF10)
                t0 = time.perf_counter()
                df.write.mode("overwrite").parquet(sink)
                dt = time.perf_counter() - t0
                shutil.rmtree(sink, ignore_errors=True)
                return dt
            df = fn(spark, SF10)
            t0 = time.perf_counter()
            pdf = df.toPandas()
            assert len(pdf) >= 0
            return time.perf_counter() - t0

        one()  # warm-up
        entry[name] = round(statistics.median(one() for _ in range(runs)), 2)
        print(json.dumps({name: entry[name]}), flush=True)
    with open(OUT, "a") as fh:
        fh.write(json.dumps(entry) + "\n")
    print(json.dumps(entry))
    spark.stop()


if __name__ == "__main__":
    main()
