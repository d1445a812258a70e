"""Scale-path operators, H-checked (SURVEY §7 M6).

Skew-safe plans must produce EXACTLY the unsalted answer — so the
DuckDB oracle runs the plain query and the hash compare proves the
salted rewrite is semantics-preserving.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kompactor_spark.operators.skew import salted_agg, salted_broadcast_dim_join
from kompactor_spark.queries import register
from kompactor_spark.tables import loader


def dec(col, scale: int = 2, prec: int = 18) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


# --------------------------------------------------------------------------
# Z1 — salted two-phase aggregation over a hot-keyed column
# --------------------------------------------------------------------------
@register(
    "z1_salted_agg",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
           CAST(MAX(user_id) AS BIGINT) AS max_user
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def z1_salted_agg(spark, sf_dir):
    T = loader(sf_dir, spark)
    out = salted_agg(
        T("events"),
        keys=["event_type"],
        aggs={
            "n_events": F.count(F.lit(1)),
            "total_value": F.sum(dec("value", 6)),
            "max_user": F.max("user_id"),
        },
        unique_cols=["event_id"],
        buckets=16,
    )
    return out.select(
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("total_value").cast("double").alias("total_value"),
        F.col("max_user").cast("bigint").alias("max_user"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Z2 — salted broadcast dim join (fact never shuffles, hot keys spread)
# --------------------------------------------------------------------------
@register(
    "z2_salted_join",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def z2_salted_join(spark, sf_dir):
    T = loader(sf_dir, spark)
    joined = salted_broadcast_dim_join(
        T("orders"),
        T("customer"),
        fact_key="o_custkey",
        dim_key="c_custkey",
        fact_unique=["o_orderkey"],
        buckets=8,
    )
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("total_price"),
        )
        .orderBy("c_mktsegment")
    )
