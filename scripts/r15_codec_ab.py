"""Round-15 shuffle-codec A/B: lz4 (default) vs zstd (guide §2.3 /
VERDICT r14 #7 — deliberately deferred from round 14).

spark.io.compression.codec is a STATIC conf, so each arm is a FULL
fresh session in its own process invocation: this script runs ONE codec
arm over the five shuffle-heaviest sf1 matched rows (m11, j14, j19,
crossdoc, clusters-collapsed) under their bench row protocols. The
driver pattern is two invocations per codec, alternating
(lz4, zstd, lz4, zstd) so ambient drift brackets both arms — see
scripts/r15_codec_ab_out.json for the merged verdict.

Usage:  python scripts/r15_codec_ab.py <lz4|zstd> [runs]
Appends one JSON line per invocation to scripts/r15_codec_ab_runs.jsonl.
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
RUNS_OUT = os.path.join(ROOT, "scripts", "r15_codec_ab_runs.jsonl")

ROWS = [
    ("m11_basket_lift", "eager"),
    ("j14_binned_interval_join", "sink"),
    ("j19_nearest_value_join", "sink"),
    ("l4_crossdoc_ngram_share", "eager"),
    ("l2_dedup_clusters_collapsed", "eager"),
]


def main() -> None:
    codec = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    assert codec in ("lz4", "zstd")

    import shutil
    import tempfile

    from pyspark.sql import SparkSession

    from kompactor_spark.queries import all_queries
    from kompactor_spark.session import DYNAMIC_CONF, default_parallelism, ensure_conf

    builder = (
        SparkSession.builder.appName(f"r15-codec-{codec}")
        .master(f"local[{default_parallelism()}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.io.compression.codec", codec)
    )
    for k, v in DYNAMIC_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    ensure_conf(spark)
    assert spark.sparkContext.getConf().get("spark.io.compression.codec") == codec

    regs = all_queries()
    sink = os.path.join(tempfile.gettempdir(), "r15_codec_sink.parquet")
    entry: dict = {"codec": codec, "t": time.strftime("%H:%M:%SZ", time.gmtime())}
    for name, proto in ROWS:
        fn = regs[name]
        spark.sparkContext.setJobDescription(f"r15-codec:{codec}:{name}")

        def one() -> float:
            if proto == "eager":
                t0 = time.perf_counter()
                pdf = fn(spark, SF1).toPandas()
                assert len(pdf) >= 0
                return time.perf_counter() - t0
            df = fn(spark, SF1)
            t0 = time.perf_counter()
            df.write.mode("overwrite").parquet(sink)
            dt = time.perf_counter() - t0
            shutil.rmtree(sink, ignore_errors=True)
            return dt

        one()  # warm-up
        entry[name] = round(statistics.median(one() for _ in range(runs)), 3)
    entry["total"] = round(sum(v for k, v in entry.items() if isinstance(v, float)), 3)
    with open(RUNS_OUT, "a") as fh:
        fh.write(json.dumps(entry) + "\n")
    print(json.dumps(entry))
    spark.stop()


if __name__ == "__main__":
    main()
