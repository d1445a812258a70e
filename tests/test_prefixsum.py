"""operators/prefixsum.py — distributed global prefix sums.

Property: byte-identical to the single-partition global window for any
total order, regardless of where the range partitioner places the
boundaries (offsets correct for boundary placement by construction).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kompactor_spark.operators.prefixsum import (
    distributed_cumsum,
    distributed_row_number,
)


def _demo(spark, n=50_000):
    return spark.range(0, n).select(
        (F.col("id") * 7919 % 1000).alias("k"),
        F.col("id").alias("uid"),
        (F.col("id") % 97 - 13).cast("long").alias("v"),  # mixed-sign values
    )


def test_cumsum_matches_global_window(spark):
    df = _demo(spark)
    got = (
        distributed_cumsum(df, [F.col("k").desc(), "uid"], "v", "cum", 8)
        .orderBy("uid")
        .toPandas()
    )
    w = Window.orderBy(F.col("k").desc(), "uid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ref = df.withColumn("cum", F.sum("v").over(w)).orderBy("uid").toPandas()
    assert got.reset_index(drop=True).equals(ref.reset_index(drop=True))


def test_row_number_matches_global_window(spark):
    df = _demo(spark, 20_000)
    got = (
        distributed_row_number(df, ["v", "uid"], "i", 8).orderBy("uid").toPandas()
    )
    ref = (
        df.withColumn(
            "i", F.row_number().over(Window.orderBy("v", "uid")).cast("long")
        )
        .orderBy("uid")
        .toPandas()
    )
    assert got.reset_index(drop=True).equals(ref.reset_index(drop=True))


def test_more_partitions_than_rows(spark):
    df = _demo(spark, 5)
    got = distributed_cumsum(df, ["uid"], "v", "cum", 32).orderBy("uid").toPandas()
    w = Window.orderBy("uid").rowsBetween(Window.unboundedPreceding, 0)
    ref = df.withColumn("cum", F.sum("v").over(w)).orderBy("uid").toPandas()
    assert got.reset_index(drop=True).equals(ref.reset_index(drop=True))


def test_empty_input(spark):
    df = _demo(spark).where(F.lit(False))
    got = distributed_cumsum(df, ["uid"], "v", "cum", 8)
    assert got.count() == 0
    assert dict(got.dtypes)["cum"] == "bigint"


def test_skewed_identical_leading_key(spark):
    # Every row shares the range key except the tiebreaker: the range
    # partitioner may place everything in few buckets; offsets must
    # still line up with the cumsum pass.
    df = spark.range(0, 30_000).select(
        F.lit(1).alias("k"), F.col("id").alias("uid"), F.lit(2).cast("long").alias("v")
    )
    got = distributed_cumsum(df, ["k", "uid"], "v", "cum", 16).orderBy("uid").toPandas()
    assert list(got["cum"]) == [2 * (i + 1) for i in range(30_000)]


def test_decimal_sum_type_preserved(spark):
    df = _demo(spark, 10_000).withColumn(
        "d", (F.col("v") / F.lit(100)).cast("decimal(20,2)")
    )
    got = distributed_cumsum(df, ["uid"], "d", "cum", 8)
    # Spark widens SUM(decimal(20,2)) -> decimal(30,2); the distributed
    # shape must land on the same type as the global window would.
    w = Window.orderBy("uid").rowsBetween(Window.unboundedPreceding, 0)
    ref = df.withColumn("cum", F.sum("d").over(w))
    assert dict(got.dtypes)["cum"] == dict(ref.dtypes)["cum"]
    g = got.orderBy("uid").toPandas()
    r = ref.orderBy("uid").toPandas()
    assert list(g["cum"]) == list(r["cum"])


def test_multi_sums_share_one_pass(spark):
    from kompactor_spark.operators.prefixsum import distributed_cumsums

    df = _demo(spark, 20_000)
    got = (
        distributed_cumsums(
            df,
            ["v", "uid"],
            {"cum_v": "v", "n": F.lit(1).cast("long")},
            8,
        )
        .orderBy("uid")
        .toPandas()
    )
    w = Window.orderBy("v", "uid").rowsBetween(Window.unboundedPreceding, 0)
    ref = (
        df.withColumn("cum_v", F.sum("v").over(w))
        .withColumn("n", F.sum(F.lit(1).cast("long")).over(w))
        .orderBy("uid")
        .toPandas()
    )
    assert got.reset_index(drop=True).equals(ref.reset_index(drop=True))

# --------------------------------------------------------------------------
# Keyed variants (round 13): PARTITION BY low-cardinality keys without
# one sort task per key. Byte-identical to the keyed window, including
# NULL keys (one PARTITION BY group; the carry-in join is null-safe).
# --------------------------------------------------------------------------


def _keyed_demo(spark, n=40_000, null_every=0):
    src = F.concat(F.lit("s"), (F.col("id") % 7).cast("string"))
    if null_every:
        src = F.when(F.col("id") % null_every == 0, F.lit(None)).otherwise(src)
    return spark.range(0, n).select(
        src.alias("g"),
        F.col("id").alias("uid"),
        (F.col("id") % 53 - 11).cast("long").alias("v"),
    )


def test_keyed_cumsum_matches_keyed_window(spark):
    from kompactor_spark.operators.prefixsum import distributed_keyed_cumsums

    df = _keyed_demo(spark)
    got = (
        distributed_keyed_cumsums(df, ["g"], [F.col("v").desc(), "uid"], {"cum": "v"}, 8)
        .orderBy("uid")
        .toPandas()
    )
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), "uid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ref = df.withColumn("cum", F.sum("v").over(w)).orderBy("uid").toPandas()
    assert got.reset_index(drop=True).equals(ref.reset_index(drop=True))


def test_keyed_cumsum_null_keys_one_group(spark):
    from kompactor_spark.operators.prefixsum import distributed_keyed_cumsums

    df = _keyed_demo(spark, 10_000, null_every=9)
    got = (
        distributed_keyed_cumsums(df, ["g"], ["uid"], {"cum": "v"}, 8)
        .orderBy("uid")
        .toPandas()
    )
    w = Window.partitionBy("g").orderBy("uid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ref = df.withColumn("cum", F.sum("v").over(w)).orderBy("uid").toPandas()
    assert got.reset_index(drop=True).equals(ref.reset_index(drop=True))


def test_keyed_row_number_matches_keyed_window(spark):
    from kompactor_spark.operators.prefixsum import distributed_keyed_row_number

    df = _keyed_demo(spark, 20_000)
    got = (
        distributed_keyed_row_number(df, ["g"], ["v", "uid"], "rn", 8)
        .orderBy("uid")
        .toPandas()
    )
    ref = (
        df.withColumn(
            "rn",
            F.row_number()
            .over(Window.partitionBy("g").orderBy("v", "uid"))
            .cast("long"),
        )
        .orderBy("uid")
        .toPandas()
    )
    assert got.reset_index(drop=True).equals(ref.reset_index(drop=True))


def test_keyed_more_partitions_than_rows(spark):
    from kompactor_spark.operators.prefixsum import distributed_keyed_cumsums

    df = _keyed_demo(spark, 5)
    got = (
        distributed_keyed_cumsums(df, ["g"], ["uid"], {"cum": "v"}, 32)
        .orderBy("uid")
        .toPandas()
    )
    w = Window.partitionBy("g").orderBy("uid").rowsBetween(Window.unboundedPreceding, 0)
    ref = df.withColumn("cum", F.sum("v").over(w)).orderBy("uid").toPandas()
    assert got.reset_index(drop=True).equals(ref.reset_index(drop=True))
