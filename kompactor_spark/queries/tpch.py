"""Classic TPC-H-shaped queries (Q3, Q5, Q10) over the driver testdata.

These are the workloads a reference user actually runs against a
compacted Parquet lake; each exercises a different plan archetype:
Q3 = filter-heavy 3-way join + top-k, Q5 = 6-way star with a cycle
check, Q10 = wide group-by over a 4-way join. All H-checked with
decimal-exact revenue sums and total ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kompactor_spark.queries import register
from kompactor_spark.tables import loader


def dec(col, scale: int = 2, prec: int = 18) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},{scale})")


_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"


def _revenue() -> F.Column:
    return dec("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - dec("l_discount"))


# --------------------------------------------------------------------------
# Q3 — shipping priority: unshipped orders of one segment, top revenue
# --------------------------------------------------------------------------
@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           CAST(SUM({_REV.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    T = loader(sf_dir, spark)
    cut = "1997-03-15 00:00:00"
    c = T("customer").where(F.col("c_mktsegment") == "BUILDING")
    o = T("orders").where(F.col("o_orderdate") < cut)
    li = T("lineitem").where(F.col("l_shipdate") > cut)
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q5 — local supplier volume: revenue where supplier and customer share
# the nation, per nation of one region and one year
# --------------------------------------------------------------------------
@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           CAST(SUM({_REV.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    T = loader(sf_dir, spark)
    o = T("orders").where(
        (F.col("o_orderdate") >= "1996-01-01 00:00:00") & (F.col("o_orderdate") < "1997-01-01 00:00:00")
    )
    c, li, s = T("customer"), T("lineitem"), T("supplier")
    n, r = T("nation"), T("region").where(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


# --------------------------------------------------------------------------
# Q10 — returned-item reporting: top customers by lost revenue
# --------------------------------------------------------------------------
@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM({_REV.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS DOUBLE) AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    T = loader(sf_dir, spark)
    o = T("orders").where(
        (F.col("o_orderdate") >= "1995-10-01 00:00:00") & (F.col("o_orderdate") < "1996-01-01 00:00:00")
    )
    li = T("lineitem").where(F.col("l_returnflag") == "R")
    c, n = T("customer"), T("nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q6 — forecast revenue change: single-table scan + predicate stack +
# scalar aggregate. The canonical pushdown test: every predicate reaches
# the Parquet scan.
# --------------------------------------------------------------------------
@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    T = loader(sf_dir, spark)
    return (
        T("lineitem")
        .where(
            (F.col("l_shipdate") >= "1996-01-01 00:00:00")
            & (F.col("l_shipdate") < "1997-01-01 00:00:00")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount", 2, 4)).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --------------------------------------------------------------------------
# Q7 — volume shipping between two nations, by supplier/customer nation
# direction and ship year
# --------------------------------------------------------------------------
@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM({_REV.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS DOUBLE) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_6')
        OR (n1.n_name = 'NATION_6' AND n2.n_name = 'NATION_9'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, CAST(year(l.l_shipdate) AS BIGINT)
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    T = loader(sf_dir, spark)
    n1 = T("nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = T("nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    li = T("lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01 00:00:00")
        & (F.col("l_shipdate") < "1998-01-01 00:00:00")
    )
    pair = (F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_6") | (
        F.col("supp_nation") == "NATION_6"
    ) & (F.col("cust_nation") == "NATION_9")
    return (
        T("supplier")
        .join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(T("orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(T("customer"), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------
# Q8 — national market share: NATION_9's share of STANDARD-part revenue
# among AMERICA-region customers, per order year
# --------------------------------------------------------------------------
@register(
    "q8_market_share",
    oracle=f"""
    WITH v AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             {_REV.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')} AS volume,
             n1.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      JOIN region r ON n2.n_regionkey = r.r_regionkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'STANDARD'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
    SELECT o_year,
           round(CAST(SUM(CASE WHEN supp_nation = 'NATION_9' THEN volume
                                ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM v
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    T = loader(sf_dir, spark)
    n1 = T("nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = T("nation").select(F.col("n_nationkey").alias("n2_key"), "n_regionkey")
    o = T("orders").where(
        (F.col("o_orderdate") >= "1996-01-01 00:00:00")
        & (F.col("o_orderdate") < "1998-01-01 00:00:00")
    )
    vol = _revenue()
    nation_vol = F.when(F.col("supp_nation") == "NATION_9", vol).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        F.broadcast(T("part").where(F.col("p_type") == "STANDARD"))
        .join(T("lineitem"), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(T("supplier")), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(T("customer"), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(
            F.broadcast(T("region").where(F.col("r_name") == "AMERICA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(nation_vol).cast("double") / F.sum(vol).cast("double"), 6
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# Q14 — promo revenue share over one ship month (join + conditional agg
# ratio)
# --------------------------------------------------------------------------
@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT round(CAST(100 AS DOUBLE)
                 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                                 THEN {_REV.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}
                                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(SUM({_REV.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS DOUBLE), 6) AS promo_revenue,
           count(*) AS n
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    T = loader(sf_dir, spark)
    li = T("lineitem").where(
        (F.col("l_shipdate") >= "1996-09-01 00:00:00")
        & (F.col("l_shipdate") < "1996-10-01 00:00:00")
    )
    vol = _revenue()
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0).cast("decimal(18,4)"))
    return (
        li.join(F.broadcast(T("part")), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0) * F.sum(promo).cast("double") / F.sum(vol).cast("double"), 6
            ).alias("promo_revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --------------------------------------------------------------------------
# Q18 — large-volume customers: orders whose total quantity exceeds the
# threshold (agg → filter → re-join shape)
# --------------------------------------------------------------------------
@register(
    "q18_large_volume_customer",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS totalprice,
           CAST(SUM(l.l_quantity) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customer(spark, sf_dir):
    T = loader(sf_dir, spark)
    li = T("lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_tq"))
        .where(F.col("_tq") > 300)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        T("customer")
        .join(T("orders"), F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(big), F.col("o_orderkey") == F.col("big_orderkey"), "left_semi")
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_totalprice").cast("double").alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q17 — small-quantity-order revenue: correlated scalar-subquery shape,
# decorrelated as a per-part average joined back (the Catalyst-friendly
# rewrite of `l_quantity < 0.2 * (SELECT avg ... WHERE same part)`)
# --------------------------------------------------------------------------
@register(
    "q17_small_qty_revenue",
    oracle="""
    SELECT round(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 6) AS avg_yearly,
           count(*) AS n
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                          FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
    """,
)
def q17_small_qty_revenue(spark, sf_dir):
    # Threshold determinism: l_quantity values are integral, so
    # avg = exact-sum / exact-count is bit-identical across engines.
    T = loader(sf_dir, spark)
    li = T("lineitem")
    avgq = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thr")
    )
    return (
        li.join(
            F.broadcast(T("part").where(F.col("p_brand") == "Brand#1")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(avgq, F.col("l_partkey") == F.col("ap_partkey"))
        .where(F.col("l_quantity") < F.col("qty_thr"))
        .agg(
            F.round(F.sum(dec("l_extendedprice")).cast("double") / 7.0, 6).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --------------------------------------------------------------------------
# Q22 — global sales opportunity: above-average-balance customers with
# no recent orders (scalar subquery + anti-join)
# --------------------------------------------------------------------------
@register(
    "q22_sales_opportunity",
    oracle="""
    SELECT CAST(c.c_nationkey AS INT) AS c_nationkey,
           count(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
                         FROM customer c2 WHERE c2.c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c.c_nationkey
    ORDER BY c_nationkey
    """,
)
def q22_sales_opportunity(spark, sf_dir):
    # Threshold = exact decimal sum / exact count, then ONE double
    # division — order-independent, so both engines agree to the bit
    # (a raw double avg() would drift in the last ulp).
    T = loader(sf_dir, spark)
    cust = T("customer")
    thr = (
        cust.where(F.col("c_acctbal") > 0)
        .agg((F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("bal_thr"))
    )
    recent = (
        T("orders")
        .where(F.col("o_orderdate") >= "2000-01-01 00:00:00")
        .select("o_custkey")
        .distinct()
    )
    return (
        cust.join(F.broadcast(thr))
        .where(F.col("c_acctbal") > F.col("bal_thr"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


# --------------------------------------------------------------------------
# Q19 — discounted revenue: disjunctive multi-attribute predicate over a
# join (OR-of-ANDs; exercises CNF conversion and partial pushdown of
# the common part-key conjunct)
# --------------------------------------------------------------------------
@register(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT CAST(SUM({_REV.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS DOUBLE) AS revenue,
           count(*) AS n
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
)
def q19_discounted_revenue(spark, sf_dir):
    T = loader(sf_dir, spark)
    q = F.col("l_quantity")
    branch = lambda brand, size_hi, q_lo, q_hi: (
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, size_hi)
        & (q >= q_lo)
        & (q <= q_hi)
    )
    return (
        T("lineitem")
        .join(F.broadcast(T("part")), F.col("p_partkey") == F.col("l_partkey"))
        .where(branch("Brand#1", 15, 1, 11) | branch("Brand#2", 25, 10, 20) | branch("Brand#3", 35, 20, 30))
        .agg(
            F.sum(_revenue()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --------------------------------------------------------------------------
# Q15 — top supplier: revenue view over a quarter, then the supplier(s)
# hitting the maximum (scalar subquery over an aggregate — decorrelated
# as an agg + broadcast max join)
# --------------------------------------------------------------------------
@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l.l_suppkey AS supplier_no,
             SUM({_REV.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS total_rev
      FROM lineitem l
      WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l.l_suppkey)
    SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_rev
    FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark, sf_dir):
    # total_rev is an exact DECIMAL sum, so `= MAX(...)` is a safe
    # equality across engines (never do this on raw double sums).
    T = loader(sf_dir, spark)
    rev = (
        T("lineitem")
        .where(
            (F.col("l_shipdate") >= "1996-01-01 00:00:00")
            & (F.col("l_shipdate") < "1996-04-01 00:00:00")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_revenue()).alias("total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        T("supplier")
        .join(rev, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(mx))
        .where(F.col("total_rev") == F.col("max_rev"))
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_rev"))
        .orderBy("s_suppkey")
    )
