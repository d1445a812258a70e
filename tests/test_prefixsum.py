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
