"""Sketch-carrying rollup: day-level answers derived from the hourly
rollup alone must match a direct day-level computation — exactly for
algebraic measures, within sketch bounds for distincts/quantiles."""

from __future__ import annotations

from pyspark.sql import functions as F

from kompactor_spark.operators.rollup import NS_PER_HOUR, hourly_rollup, reaggregate
from kompactor_spark.tables import loader
from kompactor_spark.timeutil import ns_bucket

SF = "/root/testdata/sf0.01"
NS_PER_DAY = 24 * NS_PER_HOUR


def test_rollup_reaggregation_matches_direct(spark):
    ev = loader(SF, spark)("events")
    hourly = hourly_rollup(ev).cache()
    try:
        day_from_rollup = {
            (r.bucket_ns, r.key): r
            for r in reaggregate(hourly, NS_PER_DAY).collect()
        }
        direct = {
            (r.bucket_ns, r.key): r
            for r in ev.groupBy(
                ns_bucket(F.col("ts"), NS_PER_DAY).alias("bucket_ns"),
                F.col("event_type").alias("key"),
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("value").alias("sum_value"),
                F.countDistinct("user_id").alias("exact_users"),
                F.expr("percentile(value, 0.5)").alias("exact_p50"),
            )
            .collect()
        }
        assert set(day_from_rollup) == set(direct) and direct
        for k, d in direct.items():
            r = day_from_rollup[k]
            # algebraic measures are EXACT under re-aggregation
            assert r.n == d.n
            assert abs(r.sum_value - d.sum_value) < 1e-6 * max(1.0, abs(d.sum_value))
            # sketch measures carry bounded error
            assert abs(r.approx_users - d.exact_users) <= max(1, 0.05 * d.exact_users)
            assert abs(r.approx_p50_value - d.exact_p50) <= 0.10 * max(1.0, abs(d.exact_p50))
    finally:
        hourly.unpersist()
