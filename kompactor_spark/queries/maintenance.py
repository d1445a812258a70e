"""Lake-maintenance operators: upsert (MERGE semantics composed from
joins — no table format required) and latest-per-key recency dedup.
These are the mutation patterns a compacted Parquet lake needs next.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kompactor_spark.queries import register
from kompactor_spark.tables import loader


# --------------------------------------------------------------------------
# M1 — upsert: apply a change-set to a target by key. MERGE = matched
# rows take the source's values, unmatched source rows append. Composed
# as target-antijoin + source-union — one shuffle each side, no
# row-at-a-time logic; at scale the same plan works per partition.
# The change-set is synthesized deterministically (every 100th order
# gets a price bump, plus brand-new keys past the max).
# --------------------------------------------------------------------------
@register(
    "m1_upsert",
    oracle="""
    WITH changes AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             round(o_totalprice * 1.1, 2) AS o_totalprice
      FROM orders WHERE o_orderkey % 100 = 0
      UNION ALL
      SELECT o_orderkey + 10000000, o_custkey, 'N' AS o_orderstatus,
             round(o_totalprice, 2) AS o_totalprice
      FROM orders WHERE o_orderkey % 1000 = 0
    ),
    kept AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
      FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM changes)
    )
    SELECT * FROM kept
    UNION ALL
    SELECT * FROM changes
    ORDER BY o_orderkey
    """,
)
def m1_upsert(spark, sf_dir):
    T = loader(sf_dir, spark)
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    target = T("orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    updates = (
        T("orders")
        .where(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.round(F.col("o_totalprice") * 1.1, 2).alias("o_totalprice"),
        )
    )
    inserts = (
        T("orders")
        .where(F.col("o_orderkey") % 1000 == 0)
        .select(
            (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
            "o_custkey",
            F.lit("N").alias("o_orderstatus"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
    )
    changes = updates.unionByName(inserts)
    kept = target.join(changes.select("o_orderkey"), "o_orderkey", "left_anti")
    return (
        kept.select(*cols)
        .unionByName(changes.select(*cols))
        # Round 15 (the r14 barrier pattern, measured on this untimed
        # path): the final orderBy's range-bounds sampling re-executes
        # the whole union — three orders scans + the anti probe — so a
        # hash barrier on the sort key materializes the union once and
        # the sampling re-reads the shuffle. Interleaved A/B
        # (scripts/r15_untimed_ab_out.json): 2.81 -> 2.22 s sf1.
        .repartition("o_orderkey")
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# M2 — latest-per-key: keep each (user, event_type)'s most recent event
# (recency dedup — the CDC/compaction-of-state primitive). One shuffle,
# row_number over the recency order, deterministic tiebreak.
# --------------------------------------------------------------------------
@register(
    "m2_latest_per_key",
    oracle="""
    SELECT user_id, event_type, event_id, epoch_ns(ts) AS ts_ns, round(value, 6) AS value
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id, event_type
        ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1
    ORDER BY user_id, event_type
    """,
)
def m2_latest_per_key(spark, sf_dir):
    T = loader(sf_dir, spark)
    # µs-floored ordering key — the oracle ranks µs-truncated ts, so a
    # raw-ns key could pick a different "latest" row inside one µs under
    # a TIMESTAMP(NANOS) testdata round (ADVICE r3 ordering class)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        (F.col("ts") - F.col("ts") % 1000).desc(), F.col("event_id").desc()
    )
    return (
        T("events")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "event_id",
            (F.col("ts") - F.col("ts") % 1000).alias("ts_ns"),
            F.round("value", 6).alias("value"),
        )
        .orderBy("user_id", "event_type")
    )


# --------------------------------------------------------------------------
# M4 — funnel analysis: users progressing signup → click → purchase in
# event-time order. One groupBy (min ts per step per user), ordering
# conditions on the driver-free aggregate row — the marquee product-
# analytics query, one shuffle total.
# --------------------------------------------------------------------------
@register(
    "m4_funnel",
    oracle="""
    WITH steps AS (
      SELECT user_id,
             min(ts) FILTER (WHERE event_type = 'signup') AS t_signup,
             min(ts) FILTER (WHERE event_type = 'click') AS t_click,
             min(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT CAST(count(*) FILTER (WHERE t_signup IS NOT NULL) AS BIGINT) AS n_signup,
           CAST(count(*) FILTER (WHERE t_signup IS NOT NULL AND t_click > t_signup) AS BIGINT) AS n_clicked_after,
           CAST(count(*) FILTER (WHERE t_signup IS NOT NULL AND t_click > t_signup
                                   AND t_purchase > t_click) AS BIGINT) AS n_purchased_after
    FROM steps
    """,
)
def m4_funnel(spark, sf_dir):
    T = loader(sf_dir, spark)

    def min_if(step):
        # µs-floor before comparing step orderings — the oracle compares
        # µs-truncated timestamps (ADVICE r3 ordering class)
        ts_us = F.col("ts") - F.col("ts") % 1000
        return F.min(F.when(F.col("event_type") == step, ts_us))

    steps = T("events").groupBy("user_id").agg(
        min_if("signup").alias("t_signup"),
        min_if("click").alias("t_click"),
        min_if("purchase").alias("t_purchase"),
    )
    did_signup = F.col("t_signup").isNotNull()
    clicked_after = did_signup & (F.col("t_click") > F.col("t_signup"))
    purchased_after = clicked_after & (F.col("t_purchase") > F.col("t_click"))
    return steps.agg(
        F.count(F.when(did_signup, 1)).cast("bigint").alias("n_signup"),
        F.count(F.when(clicked_after, 1)).cast("bigint").alias("n_clicked_after"),
        F.count(F.when(purchased_after, 1)).cast("bigint").alias("n_purchased_after"),
    )


# --------------------------------------------------------------------------
# M6 — snapshot diff (CDC-style): rows added/removed between two table
# versions via one full-outer presence join on the key — the audit op a
# lake runs to explain a snapshot transition
# --------------------------------------------------------------------------
@register(
    "m6_snapshot_diff",
    oracle="""
    WITH o AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 97 <> 0),
         n AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 89 <> 0)
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added' ELSE 'removed' END AS op
    FROM o FULL JOIN n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
    ORDER BY o_orderkey
    """,
)
def m6_snapshot_diff(spark, sf_dir):
    T = loader(sf_dir, spark)
    orders = T("orders").select("o_orderkey")
    old = orders.where(F.col("o_orderkey") % 97 != 0).withColumnRenamed("o_orderkey", "old_key")
    new = orders.where(F.col("o_orderkey") % 89 != 0).withColumnRenamed("o_orderkey", "new_key")
    return (
        old.join(new, old.old_key == new.new_key, "full")
        .where(F.col("old_key").isNull() | F.col("new_key").isNull())
        .select(
            F.coalesce("old_key", "new_key").alias("o_orderkey"),
            F.when(F.col("old_key").isNull(), "added").otherwise("removed").alias("op"),
        )
        # Round 15 barrier (scripts/r15_untimed_ab_out.json, 1.10 ->
        # 0.94 s sf1): the sort's sampling pass re-ran the full-outer
        # sort-merge join; the barrier shuffles only the ~2% diff rows.
        .repartition("o_orderkey")
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# M8 — SCD-2 history reconstruction (new round 4): turn a per-user
# change stream into slowly-changing-dimension validity intervals —
# each state row carries [valid_from, valid_to) with NULL valid_to on
# the current row, plus is_current and version number. One window
# shuffle on the key (lead() supplies the closing edge); at 100 TB this
# is the standard event-stream → dimension-table build, and the window
# partitioning reuses the same key a MERGE target would be bucketed by.
# Timestamps µs-floored (oracle sees µs).
# --------------------------------------------------------------------------
@register(
    "m8_scd2_history",
    oracle="""
    SELECT user_id,
           epoch_ns(ts) AS valid_from_ns,
           lead(epoch_ns(ts)) OVER w AS valid_to_ns,
           CAST(lead(epoch_ns(ts)) OVER w IS NULL AS BOOLEAN) AS is_current,
           CAST(row_number() OVER w AS BIGINT) AS version,
           round(value, 6) + 0.0 AS state_value
    FROM events
    WHERE event_type IN ('signup', 'purchase')
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
    ORDER BY user_id, version
    """,
)
def m8_scd2_history(spark, sf_dir):
    T = loader(sf_dir, spark)
    ts_us = (F.col("ts") - F.col("ts") % 1000).alias("ts_us")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    changes = (
        T("events")
        .where(F.col("event_type").isin("signup", "purchase"))
        .select("user_id", ts_us, "event_id", "value")
    )
    return (
        changes.select(
            "user_id",
            F.col("ts_us").alias("valid_from_ns"),
            F.lead("ts_us").over(w).alias("valid_to_ns"),
            F.lead("ts_us").over(w).isNull().alias("is_current"),
            F.row_number().over(w).cast("bigint").alias("version"),
            (F.round("value", 6) + F.lit(0.0)).alias("state_value"),
        )
        .orderBy("user_id", "version")
    )


# --------------------------------------------------------------------------
# W13 — week-over-week change (new round 4): per event_type, weekly
# event counts with absolute and relative change vs the prior week —
# the reporting primitive behind every growth dashboard. Weekly buckets
# are exact integer ns arithmetic (epoch-aligned 7-day windows, not
# calendar weeks — deterministic across engines and timezones); one
# narrow aggregate then a lag over the tiny weekly series.
# --------------------------------------------------------------------------
_WEEK_NS = 7 * 24 * 3_600_000_000_000


@register(
    "w13_wow_change",
    oracle=f"""
    WITH wk AS (
      SELECT event_type,
             (epoch_ns(ts) // {_WEEK_NS}) * {_WEEK_NS} AS week_ns,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    d AS (
      SELECT event_type, week_ns, n,
             lag(n) OVER (PARTITION BY event_type ORDER BY week_ns) AS prev_n
      FROM wk)
    SELECT event_type, week_ns, n,
           prev_n,
           CAST(n - prev_n AS BIGINT) AS abs_change,
           round(CAST(n - prev_n AS DOUBLE) / CAST(prev_n AS DOUBLE), 6) + 0.0 AS rel_change
    FROM d
    WHERE prev_n IS NOT NULL
    ORDER BY event_type, week_ns
    """,
)
def w13_wow_change(spark, sf_dir):
    T = loader(sf_dir, spark)
    wk = (
        T("events")
        .groupBy(
            "event_type",
            (F.col("ts") - F.col("ts") % _WEEK_NS).cast("long").alias("week_ns"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy("week_ns")
    d = wk.withColumn("prev_n", F.lag("n").over(w))
    return (
        d.where(F.col("prev_n").isNotNull())
        .select(
            "event_type",
            "week_ns",
            "n",
            "prev_n",
            (F.col("n") - F.col("prev_n")).cast("bigint").alias("abs_change"),
            (
                F.round(
                    (F.col("n") - F.col("prev_n")).cast("double")
                    / F.col("prev_n").cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("rel_change"),
        )
        .orderBy("event_type", "week_ns")
    )


# --------------------------------------------------------------------------
# M7 — dynamic partition overwrite: rewrite ONLY the partitions present
# in the incoming batch, leaving every other partition untouched — the
# idempotent-backfill primitive the compaction pipeline and every
# lakehouse maintenance job rely on (INSERT OVERWRITE ... PARTITION
# semantics; Spark `partitionOverwriteMode=dynamic`). The query lands
# events day-partitioned, then overwrites the d % 7 == 0 partitions
# with corrected values; a full re-read must show exactly those
# partitions replaced. A static-overwrite bug (truncate-all) or a
# missed-partition bug changes the result set and fails the hash. At
# 100 TB this is the only sane backfill shape: the job's write set IS
# its partition set, no read-modify-write of the whole table.
# --------------------------------------------------------------------------
_NS_PER_DAY = 86_400_000_000_000


@register(
    "m7_dynamic_partition_overwrite",
    oracle=f"""
    WITH e AS (SELECT event_id, epoch_ns(ts) // {_NS_PER_DAY} AS d, value FROM events)
    SELECT event_id, CAST(d AS BIGINT) AS d,
           round(CASE WHEN d % 7 = 0 THEN value + 100.0 ELSE value END, 6) AS value
    FROM e ORDER BY event_id
    """,
)
def m7_dynamic_partition_overwrite(spark, sf_dir):
    from kompactor_spark.sources import clear_scratch

    T = loader(sf_dir, spark)
    tag = sf_dir.rstrip("/").split("/")[-1]
    path = clear_scratch("m7_day_partitioned_" + tag)
    base = T("events").select(
        "event_id",
        F.expr(f"ts div {_NS_PER_DAY}").cast("long").alias("d"),
        "value",
    )
    base.write.mode("overwrite").partitionBy("d").parquet(path)
    # corrected batch: only the d % 7 == 0 partitions are in the write
    # set, so ONLY those are replaced (dynamic mode) — static mode would
    # truncate the whole table first and the re-read would lose rows
    repl = base.where(F.col("d") % 7 == 0).withColumn(
        "value", F.col("value") + F.lit(100.0)
    )
    (
        repl.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("d")
        .parquet(path)
    )
    return (
        spark.read.parquet(path)
        .select(
            "event_id",
            F.col("d").cast("bigint").alias("d"),
            F.round("value", 6).alias("value"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# M9 — CDC apply with deletes: fold a change log of I/U/D operations
# (multiple changes per key, ordered by a sequence number) into a
# target snapshot — the Debezium/OLTP-extract merge shape that M1's
# insert/update upsert doesn't cover. The ENGINE side implements the
# generic algorithm (latest-op-wins window over the log, full outer
# merge, D drops the key); the ORACLE states the closed-form expected
# final state, so a wrong ordering (applying U after a later D), a
# missed delete, or a dropped untouched key all fail the hash. Log
# synthesized from key-modulo classes: %100 -> U(seq1, price*1.05),
# %200 -> D(seq2), %400 -> I(seq3, reinsert 'R'/1.00) — so %400 keys
# survive via reinsert, %200-only keys vanish, %100-only keys update.
# At 100 TB: one shuffle of the (small) change log keyed like the
# target; the merge join reuses the target's key partitioning.
# --------------------------------------------------------------------------
@register(
    "m9_cdc_apply",
    oracle="""
    SELECT o_orderkey,
           o_custkey,
           CASE WHEN o_orderkey % 400 = 0 THEN 'R'
                ELSE o_orderstatus END AS o_orderstatus,
           CASE WHEN o_orderkey % 400 = 0 THEN 1.0
                WHEN o_orderkey % 100 = 0 THEN round(o_totalprice * 1.05, 2)
                ELSE round(o_totalprice, 2) END AS o_totalprice
    FROM orders
    WHERE NOT (o_orderkey % 200 = 0 AND o_orderkey % 400 <> 0)
    ORDER BY o_orderkey
    """,
)
def m9_cdc_apply(spark, sf_dir):
    from pyspark.sql import Window

    T = loader(sf_dir, spark)
    cols = ["o_custkey", "o_orderstatus", "o_totalprice"]
    target = T("orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    o = T("orders")
    upd = o.where(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        F.lit(1).alias("seq"),
        F.lit("U").alias("op"),
        "o_custkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 1.05, 2).alias("o_totalprice"),
    )
    dels = o.where(F.col("o_orderkey") % 200 == 0).select(
        "o_orderkey",
        F.lit(2).alias("seq"),
        F.lit("D").alias("op"),
        F.lit(None).cast("long").alias("o_custkey"),
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    ins = o.where(F.col("o_orderkey") % 400 == 0).select(
        "o_orderkey",
        F.lit(3).alias("seq"),
        F.lit("I").alias("op"),
        "o_custkey",
        F.lit("R").alias("o_orderstatus"),
        F.lit(1.0).alias("o_totalprice"),
    )
    log = upd.unionAll(dels).unionAll(ins)
    w = Window.partitionBy("o_orderkey").orderBy(F.col("seq").desc())
    latest = (
        log.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn", "seq")
    )
    t = target.alias("t")
    c = latest.alias("c")
    merged = t.join(c, F.col("t.o_orderkey") == F.col("c.o_orderkey"), "full_outer")
    has_change = F.col("c.op").isNotNull()
    return (
        merged.where(~(has_change & (F.col("c.op") == "D")))
        .select(
            F.coalesce(F.col("t.o_orderkey"), F.col("c.o_orderkey")).alias(
                "o_orderkey"
            ),
            *[
                F.when(has_change, F.col(f"c.{x}"))
                .otherwise(F.col(f"t.{x}"))
                .alias(x)
                for x in cols
            ],
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# J17 — point-in-time (SCD-2) dimension join (new round 4): each
# `purchase` fact is joined to the dimension state that was valid AT
# the fact's timestamp — the temporally-correct enrichment every
# as-was report and ML feature backfill needs (joining to the CURRENT
# state leaks the future). The dimension is the m8-style change stream
# (signup events = state versions per user). Shape: the as-of union+
# window mechanism (operators/asof.py) — dim changes and facts merge
# into ONE keyed window pass with last(..., ignorenulls), never a
# per-fact interval probe; at 100 TB that is one shuffle on the
# shared user key. The oracle proves equivalence against the explicit
# validity-interval join. Tie discipline: a state change at the exact
# fact instant applies (dim kind sorts first); unique event_id breaks
# remaining ties identically in both engines.
# --------------------------------------------------------------------------
@register(
    "j17_point_in_time_join",
    oracle="""
    WITH scd AS (
      SELECT user_id,
             epoch_ns(ts) AS valid_from,
             lead(epoch_ns(ts)) OVER (PARTITION BY user_id
                                      ORDER BY epoch_ns(ts), event_id) AS valid_to,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_ns(ts), event_id) AS version,
             round(value, 6) + 0.0 AS state_value
      FROM events WHERE event_type = 'signup'),
    f AS (
      SELECT user_id, event_id, epoch_ns(ts) AS t,
             round(value, 6) + 0.0 AS purchase_value
      FROM events WHERE event_type = 'purchase')
    SELECT f.user_id, f.event_id, CAST(f.t AS BIGINT) AS ts_ns,
           f.purchase_value,
           CAST(scd.version AS BIGINT) AS state_version,
           scd.state_value
    FROM f JOIN scd
      ON f.user_id = scd.user_id
     AND f.t >= scd.valid_from
     AND (scd.valid_to IS NULL OR f.t < scd.valid_to)
    ORDER BY f.user_id, f.t, f.event_id
    """,
)
def j17_point_in_time_join(spark, sf_dir):
    T = loader(sf_dir, spark)
    ev = T("events")
    ts_us = F.col("ts") - F.col("ts") % 1000  # µs floor: DuckDB truncates
    # ns-encoded parquet timestamps to µs, so ordering-sensitive ops
    # must compare at µs grain (m8/x18 policy)
    dim = ev.where(F.col("event_type") == "signup").select(
        "user_id",
        ts_us.alias("t"),
        "event_id",
        F.lit(0).alias("kind"),
        (F.round("value", 6) + F.lit(0.0)).alias("state"),
        F.lit(None).cast("double").alias("fact_value"),
    )
    fact = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        ts_us.alias("t"),
        "event_id",
        F.lit(1).alias("kind"),
        F.lit(None).cast("double").alias("state"),
        (F.round("value", 6) + F.lit(0.0)).alias("fact_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = dim.unionByName(fact).select(
        "user_id",
        "t",
        "event_id",
        "kind",
        "fact_value",
        F.last("state", ignorenulls=True).over(w).alias("state_value"),
        F.sum((F.col("kind") == 0).cast("long")).over(w).alias("state_version"),
    )
    return (
        merged.where((F.col("kind") == 1) & F.col("state_value").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.col("t").cast("bigint").alias("ts_ns"),
            F.col("fact_value").alias("purchase_value"),
            F.col("state_version").cast("bigint").alias("state_version"),
            "state_value",
        )
        .orderBy("user_id", "ts_ns", "event_id")
    )


# --------------------------------------------------------------------------
# M12 — column-profile drift (new round 4): the data-contract monitor —
# per column, compare the profile (row count, null rate, distinct
# count, min/max) of two dataset versions (deterministic md5 halves of
# orders stand in for v1/v2) and flag drift. One conditional-aggregate
# scan per metric family (no per-column passes), output long-form one
# row per (column, metric) with both sides and the delta — the shape a
# contract checker alerts on. All metrics exact; doubles rounded.
# --------------------------------------------------------------------------
@register(
    "m12_profile_drift",
    oracle="""
    WITH v AS (
      SELECT *, CASE WHEN md5('drift:' || CAST(o_orderkey AS VARCHAR)) < '8'
                     THEN 'v1' ELSE 'v2' END AS ver
      FROM orders),
    m AS (
      SELECT ver,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS d_cust,
             CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS d_status,
             round(MIN(o_totalprice), 6) AS min_price,
             round(MAX(o_totalprice), 6) AS max_price
      FROM v GROUP BY ver),
    long AS (
      SELECT 'n_rows' AS metric, ver, CAST(n_rows AS DOUBLE) AS val FROM m
      UNION ALL SELECT 'distinct_custkey', ver, CAST(d_cust AS DOUBLE) FROM m
      UNION ALL SELECT 'distinct_status', ver, CAST(d_status AS DOUBLE) FROM m
      UNION ALL SELECT 'min_totalprice', ver, min_price FROM m
      UNION ALL SELECT 'max_totalprice', ver, max_price FROM m)
    SELECT metric,
           MAX(CASE WHEN ver = 'v1' THEN val END) AS v1,
           MAX(CASE WHEN ver = 'v2' THEN val END) AS v2,
           round(MAX(CASE WHEN ver = 'v2' THEN val END)
                 - MAX(CASE WHEN ver = 'v1' THEN val END), 6) + 0.0 AS delta
    FROM long GROUP BY metric
    ORDER BY metric
    """,
)
def m12_profile_drift(spark, sf_dir):
    T = loader(sf_dir, spark)
    h = F.md5(F.concat(F.lit("drift:"), F.col("o_orderkey").cast("string")))
    v = T("orders").withColumn("ver", F.when(h < "8", "v1").otherwise("v2"))
    m = v.groupBy("ver").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("o_custkey").cast("bigint").alias("d_cust"),
        F.countDistinct("o_orderstatus").cast("bigint").alias("d_status"),
        F.round(F.min("o_totalprice"), 6).alias("min_price"),
        F.round(F.max("o_totalprice"), 6).alias("max_price"),
    )
    pieces = [
        ("n_rows", F.col("n_rows").cast("double")),
        ("distinct_custkey", F.col("d_cust").cast("double")),
        ("distinct_status", F.col("d_status").cast("double")),
        ("min_totalprice", F.col("min_price")),
        ("max_totalprice", F.col("max_price")),
    ]
    long = None
    for name, col in pieces:
        part = m.select(F.lit(name).alias("metric"), "ver", col.alias("val"))
        long = part if long is None else long.unionByName(part)
    v1 = F.max(F.when(F.col("ver") == "v1", F.col("val")))
    v2 = F.max(F.when(F.col("ver") == "v2", F.col("val")))
    return (
        long.groupBy("metric")
        .agg(v1.alias("v1"), v2.alias("v2"), (F.round(v2 - v1, 6) + F.lit(0.0)).alias("delta"))
        .orderBy("metric")
    )
