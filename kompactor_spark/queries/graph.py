"""Graph-construction operators over the events stream.

The user-user co-occurrence graph (who is active in the same place at
the same time) is the standard first step of community detection,
fraud-ring mining, and collaborative filtering. Building it at 100 TB
is a JOIN-SHAPE problem, not a graph-library problem: activity is first
deduplicated to one row per (user, bucket) — the only pass over raw
events — and the quadratic pair expansion runs per bucket, bounded by
the bucket's active-user count (pick the bucket grain so this is
bounded; hot buckets split with the same salting discipline as the
range join). The dedup clusters in operators/dedup.py already use the
same connected-components machinery downstream of edges like these.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kompactor_spark.queries import register
from kompactor_spark.tables import loader

NS_PER_HOUR = 3_600_000_000_000


# --------------------------------------------------------------------------
# G1 — co-occurrence edge list: weight(u, v) = number of distinct
# (hour, event_type) buckets where BOTH users were active, kept when
# >= 2 (a single shared bucket is noise). Shapes: one distinct pass
# over raw events (user, bucket), a per-bucket self-join on the bucket
# key (never a global cross join), then a pair-keyed count.
# --------------------------------------------------------------------------
_G1_MIN_W = 2


@register(
    "g1_cooccurrence_graph",
    oracle=f"""
    WITH act AS (
      SELECT DISTINCT user_id,
             epoch_ns(ts) // {NS_PER_HOUR} AS h, event_type
      FROM events),
    p AS (
      SELECT a.user_id AS u, b.user_id AS v
      FROM act a JOIN act b USING (h, event_type)
      WHERE a.user_id < b.user_id)
    SELECT u, v, CAST(count(*) AS BIGINT) AS w
    FROM p GROUP BY u, v
    HAVING count(*) >= {_G1_MIN_W}
    ORDER BY u, v
    """,
)
def g1_cooccurrence_graph(spark, sf_dir):
    T = loader(sf_dir, spark)
    act = (
        T("events")
        .select(
            "user_id",
            (F.col("ts") - F.col("ts") % NS_PER_HOUR).alias("h"),
            "event_type",
        )
        .distinct()
    )
    a = act.select(F.col("user_id").alias("u"), "h", "event_type")
    b = act.select(F.col("user_id").alias("v"), "h", "event_type")
    return (
        a.join(b, ["h", "event_type"])
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
        .where(F.col("w") >= _G1_MIN_W)
        .orderBy("u", "v")
    )


# --------------------------------------------------------------------------
# G2 — weighted degree centrality from the G1 edge list: per user, the
# number of co-occurrence partners and total edge weight, top 25 by
# (weighted degree, user). Edges are undirected, so each endpoint
# contributes — the explode keeps it one pass over the edge list.
# --------------------------------------------------------------------------
@register(
    "g2_degree_centrality",
    oracle=f"""
    WITH act AS (
      SELECT DISTINCT user_id,
             epoch_ns(ts) // {NS_PER_HOUR} AS h, event_type
      FROM events),
    p AS (
      SELECT a.user_id AS u, b.user_id AS v
      FROM act a JOIN act b USING (h, event_type)
      WHERE a.user_id < b.user_id),
    e AS (
      SELECT u, v, count(*) AS w FROM p GROUP BY u, v
      HAVING count(*) >= {_G1_MIN_W}),
    ends AS (
      SELECT u AS user_id, w FROM e
      UNION ALL
      SELECT v AS user_id, w FROM e)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS degree,
           CAST(sum(w) AS BIGINT) AS weighted_degree
    FROM ends GROUP BY user_id
    ORDER BY weighted_degree DESC, user_id
    LIMIT 25
    """,
)
def g2_degree_centrality(spark, sf_dir):
    edges = g1_cooccurrence_graph(spark, sf_dir)
    ends = edges.select(F.col("u").alias("user_id"), "w").unionAll(
        edges.select(F.col("v").alias("user_id"), "w")
    )
    return (
        ends.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("degree"),
            F.sum("w").cast("bigint").alias("weighted_degree"),
        )
        .orderBy(F.col("weighted_degree").desc(), "user_id")
        .limit(25)
    )
