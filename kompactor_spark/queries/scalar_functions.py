"""Scalar function surface (SURVEY §2.B F1-F8).

Cross-engine type pinning: Spark ceil/floor return BIGINT while DuckDB
returns DOUBLE → explicit casts both sides; libm-backed functions
(pow/ln/log10) rounded to 6 dp; Spark posexplode is 0-based while
DuckDB ordinality is 1-based → aligned explicitly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kompactor_spark.queries import register
from kompactor_spark.tables import loader


# --------------------------------------------------------------------------
# F1 — string functions
# --------------------------------------------------------------------------
@register(
    "f1_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_brand)                          AS brand_u,
           lower(p_type)                           AS type_l,
           CAST(length(p_name) AS BIGINT)          AS name_len,
           substr(p_name, 1, 8)                    AS name_pfx,
           concat(p_brand, ':', p_type)            AS brand_type,
           trim('  ' || p_brand || ' ')            AS brand_trim,
           replace(p_type, ' ', '_')               AS type_us,
           lpad(CAST(p_size AS VARCHAR), 4, '0')   AS size_pad,
           CAST(p_name LIKE '%ol%' AS BOOLEAN)     AS has_ol,
           split_part(p_type, ' ', 1)              AS type_head,
           regexp_extract(p_name, '([a-z]+)', 1)   AS first_word,
           CAST(starts_with(p_brand, 'Brand#1') AS BOOLEAN) AS b1
    FROM part
    ORDER BY p_partkey
    """,
)
def f1_string_funcs(spark, sf_dir):
    T = loader(sf_dir, spark)
    return (
        T("part")
        .select(
            "p_partkey",
            F.upper("p_brand").alias("brand_u"),
            F.lower("p_type").alias("type_l"),
            F.length("p_name").cast("bigint").alias("name_len"),
            F.substring("p_name", 1, 8).alias("name_pfx"),
            F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
            F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias("brand_trim"),
            F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_us"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
            F.col("p_name").like("%ol%").alias("has_ol"),
            F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
            F.regexp_extract(F.col("p_name"), "([a-z]+)", 1).alias("first_word"),
            F.startswith(F.col("p_brand"), F.lit("Brand#1")).alias("b1"),
        )
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# F2 — date/time functions (timestamp[ms] table columns + ns-long events)
# --------------------------------------------------------------------------
@register(
    "f2_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate)  AS BIGINT) AS y,
           CAST(month(o_orderdate) AS BIGINT) AS m,
           CAST(day(o_orderdate)   AS BIGINT) AS d,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d %H:%M:%S') AS month_start,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
           CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS BIGINT) AS days_to_98,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS od_str
    FROM orders
    WHERE o_orderkey <= 2000
    ORDER BY o_orderkey
    """,
)
def f2_date_funcs(spark, sf_dir):
    T = loader(sf_dir, spark)
    return (
        T("orders")
        .where(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            F.year("o_orderdate").cast("bigint").alias("y"),
            F.month("o_orderdate").cast("bigint").alias("m"),
            F.dayofmonth("o_orderdate").cast("bigint").alias("d"),
            F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").alias("month_start"),
            F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias("plus30"),
            F.datediff(F.lit("1998-01-01").cast("date"), F.col("o_orderdate").cast("date"))
            .cast("bigint")
            .alias("days_to_98"),
            F.date_format(F.col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("od_str"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# F2b — ns-long ↔ timestamp conversion on events (engine ns-time policy)
# --------------------------------------------------------------------------
@register(
    "f2_ns_time",
    oracle="""
    SELECT event_id,
           epoch_ns(ts) AS ts_ns,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_str,
           CAST(date_part('hour', ts) AS BIGINT) AS hour_of_day
    FROM events
    ORDER BY event_id
    """,
)
def f2_ns_time(spark, sf_dir):
    from kompactor_spark.timeutil import NS_PER_HOUR, ns_bucket, ns_to_timestamp

    T = loader(sf_dir, spark)
    ts = F.col("ts")
    return (
        T("events")
        .select(
            "event_id",
            (ts - ts % 1000).alias("ts_ns"),  # µs floor: DuckDB reads ns parquet as µs
            F.date_format(ns_to_timestamp(ns_bucket(ts, NS_PER_HOUR)), "yyyy-MM-dd HH:mm:ss").alias("hour_str"),
            F.hour(ns_to_timestamp(ts)).cast("bigint").alias("hour_of_day"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# F3 — math functions
# --------------------------------------------------------------------------
@register(
    "f3_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1)                          AS price_r1,
           round(abs(l_discount - 0.05), 6)                   AS disc_dev,
           CAST(ceil(l_quantity)  AS BIGINT)                  AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT)                  AS qty_floor,
           CAST(l_partkey % 7 AS BIGINT)                      AS pk_mod7,
           round(pow(l_quantity, 2.0), 6)                     AS qty_sq,
           round(sqrt(l_extendedprice), 6)                    AS price_sqrt,
           round(ln(l_extendedprice), 6)                      AS price_ln,
           round(log10(l_extendedprice), 6)                   AS price_log10,
           CAST(sign(l_discount - 0.05) AS DOUBLE)            AS disc_sign,
           greatest(l_quantity, 25.0)                         AS qty_hi,
           least(l_quantity, 25.0)                            AS qty_lo
    FROM lineitem
    WHERE l_orderkey <= 1000
    ORDER BY l_orderkey, l_linenumber
    """,
)
def f3_math_funcs(spark, sf_dir):
    T = loader(sf_dir, spark)
    return (
        T("lineitem")
        .where(F.col("l_orderkey") <= 1000)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 1).alias("price_r1"),
            F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("disc_dev"),
            F.ceil("l_quantity").cast("bigint").alias("qty_ceil"),
            F.floor("l_quantity").cast("bigint").alias("qty_floor"),
            (F.col("l_partkey") % 7).cast("bigint").alias("pk_mod7"),
            F.round(F.pow("l_quantity", F.lit(2.0)), 6).alias("qty_sq"),
            F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
            F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
            F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
            F.signum(F.col("l_discount") - 0.05).cast("double").alias("disc_sign"),
            F.greatest(F.col("l_quantity"), F.lit(25.0)).alias("qty_hi"),
            F.least(F.col("l_quantity"), F.lit(25.0)).alias("qty_lo"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# --------------------------------------------------------------------------
# F4 — conditional expressions
# --------------------------------------------------------------------------
@register(
    "f4_conditionals",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END                        AS bal_tier,
           coalesce(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           CAST(CASE WHEN c_acctbal >= 0 THEN 1 ELSE 0 END AS BIGINT) AS is_positive,
           if(c_nationkey % 2 = 0, 'even', 'odd')      AS nk_parity
    FROM customer
    ORDER BY c_custkey
    """,
)
def f4_conditionals(spark, sf_dir):
    T = loader(sf_dir, spark)
    return (
        T("customer")
        .select(
            "c_custkey",
            F.when(F.col("c_acctbal") < 0, "debt")
            .when(F.col("c_acctbal") < 5000, "low")
            .otherwise("high")
            .alias("bal_tier"),
            F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias("seg_or_other"),
            F.when(F.col("c_acctbal") >= 0, 1).otherwise(0).cast("bigint").alias("is_positive"),
            F.when(F.col("c_nationkey") % 2 == 0, "even").otherwise("odd").alias("nk_parity"),
        )
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# F5 — array functions on the embedding vector column
# --------------------------------------------------------------------------
@register(
    "f5_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) + 0.0 AS first_val,
           array_to_string(
             list_transform(list_slice(CAST(embedding AS DOUBLE[]), 1, 4),
                            x -> CAST(CAST(round(x, 6) AS DECIMAL(18,6)) AS VARCHAR)),
             ',') AS head4,
           round(list_sort(CAST(embedding AS DOUBLE[]))[1], 6) + 0.0 AS min_val
    FROM embeddings
    ORDER BY vec_id
    """,
)
def f5_array_funcs(spark, sf_dir):
    # head4 serialized to a canonical decimal CSV (driver canonicalizer
    # cannot hash ndarray cells — round-1 driver-ERR).
    T = loader(sf_dir, spark)
    emb_d = F.col("embedding").cast("array<double>")
    return (
        T("embeddings")
        .select(
            "vec_id",
            F.size("embedding").cast("bigint").alias("dim"),
            F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(emb_d, 1, 4),
                    lambda x: F.round(x, 6).cast("decimal(18,6)").cast("string"),
                ),
            ).alias("head4"),
            F.round(F.element_at(F.sort_array(emb_d), 1), 6).alias("min_val"),
        )
        .orderBy("vec_id")
    )


# --------------------------------------------------------------------------
# F5b — explode / posexplode (zipped parallel unnest on the oracle side;
# Spark pos is 0-based, ordinality is 1-based → aligned to 1-based)
# --------------------------------------------------------------------------
@register(
    "f5_posexplode",
    oracle="""
    SELECT vec_id,
           unnest(generate_series(1, 3)) AS pos,
           unnest(list_transform(list_slice(CAST(embedding AS DOUBLE[]), 1, 3),
                                 x -> round(x, 6) + 0.0)) AS val
    FROM embeddings
    WHERE vec_id < 100
    ORDER BY vec_id, pos
    """,
)
def f5_posexplode(spark, sf_dir):
    T = loader(sf_dir, spark)
    head3 = F.transform(F.slice(F.col("embedding").cast("array<double>"), 1, 3), lambda x: F.round(x, 6))
    return (
        T("embeddings")
        .where(F.col("vec_id") < 100)
        .select("vec_id", F.posexplode(head3).alias("pos0", "val"))
        .select("vec_id", (F.col("pos0") + 1).cast("bigint").alias("pos"), "val")
        .orderBy("vec_id", "pos")
    )


# --------------------------------------------------------------------------
# F6 — map construct + lookup (scalars out: map hash layouts differ)
# --------------------------------------------------------------------------
@register(
    "f6_map_funcs",
    oracle="""
    SELECT n_nationkey,
           (map {'name': n_name, 'region': CAST(n_regionkey AS VARCHAR)})['name'][1]   AS m_name,
           (map {'name': n_name, 'region': CAST(n_regionkey AS VARCHAR)})['region'][1] AS m_region,
           CAST(cardinality(map {'name': n_name, 'region': CAST(n_regionkey AS VARCHAR)}) AS BIGINT) AS m_size
    FROM nation
    ORDER BY n_nationkey
    """,
)
def f6_map_funcs(spark, sf_dir):
    T = loader(sf_dir, spark)
    m = F.create_map(
        F.lit("name"), F.col("n_name"), F.lit("region"), F.col("n_regionkey").cast("string")
    )
    return (
        T("nation")
        .select(
            "n_nationkey",
            F.element_at(m, "name").alias("m_name"),
            F.element_at(m, "region").alias("m_region"),
            F.size(m).cast("bigint").alias("m_size"),
        )
        .orderBy("n_nationkey")
    )


# --------------------------------------------------------------------------
# F7 — JSON extraction from the events.props string column
# --------------------------------------------------------------------------
@register(
    "f7_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           json_extract_string(props, '$.missing') AS missing_val
    FROM events
    ORDER BY event_id
    """,
)
def f7_json_extract(spark, sf_dir):
    from kompactor_spark.tables import fan_out

    T = loader(sf_dir, spark)
    # ONE from_json parse per row instead of one get_json_object parse
    # PER EXTRACTED PATH (measured 2x at sf0.1 — get_json_object
    # re-parses the document for every path expression); fan_out because
    # the compact events file otherwise serializes the parse onto one
    # input split (same decompression-amplification class as the text
    # queries). Missing keys surface as null struct fields, matching
    # json_extract_string semantics.
    j = F.from_json("props", "k bigint, missing string")
    return (
        fan_out(T("events"))
        .select("event_id", j.alias("j"))
        .select(
            "event_id",
            F.col("j.k").alias("k_val"),
            F.col("j.missing").alias("missing_val"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# F8 — casts across the numeric/string/date lattice
# --------------------------------------------------------------------------
@register(
    "f8_casts",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR)                         AS key_str,
           CAST(o_orderkey AS DOUBLE)                          AS key_dbl,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_dec_str,
           CAST(CAST(o_totalprice AS DECIMAL(18,0)) AS BIGINT)  AS price_whole,
           CAST(CAST('1995-03-15' AS DATE) AS VARCHAR)         AS lit_date,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR)          AS od_date_str
    FROM orders
    WHERE o_orderkey <= 2000
    ORDER BY o_orderkey
    """,
)
def f8_casts(spark, sf_dir):
    T = loader(sf_dir, spark)
    return (
        T("orders")
        .where(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            F.col("o_orderkey").cast("string").alias("key_str"),
            F.col("o_orderkey").cast("double").alias("key_dbl"),
            F.col("o_totalprice").cast("decimal(18,2)").cast("string").alias("price_dec_str"),
            F.col("o_totalprice").cast("decimal(18,0)").cast("bigint").alias("price_whole"),
            F.lit("1995-03-15").cast("date").cast("string").alias("lit_date"),
            F.col("o_orderdate").cast("date").cast("string").alias("od_date_str"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# F9 — Variant-typed JSON access (Spark 4 VariantType: parse once,
# extract typed — the modern engine path for semi-structured columns;
# F7 covers the classic get_json_object string path). Oracle uses plain
# json_extract; results must agree exactly.
# --------------------------------------------------------------------------
@register(
    "f9_variant_json",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max,
           count(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def f9_variant_json(spark, sf_dir):
    T = loader(sf_dir, spark)
    k = F.variant_get(F.parse_json("props"), "$.k", "long")
    return (
        T("events")
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").cast("bigint").alias("k_sum"),
            F.max("k").cast("bigint").alias("k_max"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# R5 — ClickHouse-compat scalar surface (kompactor.ts:154-157 loads the
# chsql DuckDB extension and never calls it; we implement the surface
# for real). Exercises kompactor_spark.functions: toYYYYMM /
# toStartOfHour / toUnixTimestamp / multiIf — all JVM-side expressions
# over ns-longs.
# --------------------------------------------------------------------------
@register(
    "r5_chsql_compat",
    oracle="""
    SELECT CAST(date_part('year', ts) * 100 + date_part('month', ts) AS INT) AS yyyymm,
           CASE WHEN value > 100 THEN 'high'
                WHEN value > 25  THEN 'mid'
                ELSE 'low' END AS sev,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN((epoch_ns(ts) // 3600000000000) * 3600000000000) AS first_hour_ns,
           MAX(epoch_ns(ts) // 1000000000) AS last_unix_s
    FROM events
    GROUP BY 1, 2
    ORDER BY yyyymm, sev
    """,
)
def r5_chsql_compat(spark, sf_dir):
    from kompactor_spark import functions as ch

    T = loader(sf_dir, spark)
    ev = T("events")
    sev = ch.multiIf(
        F.col("value") > 100, F.lit("high"),
        F.col("value") > 25, F.lit("mid"),
        F.lit("low"),
    )
    return (
        ev.select(
            ch.toYYYYMM("ts").alias("yyyymm"),
            sev.alias("sev"),
            ch.toStartOfHour("ts").alias("hour_ns"),
            ch.toUnixTimestamp("ts").alias("unix_s"),
        )
        .groupBy("yyyymm", "sev")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("hour_ns").alias("first_hour_ns"),
            F.max("unix_s").alias("last_unix_s"),
        )
        .orderBy("yyyymm", "sev")
    )


# --------------------------------------------------------------------------
# F2c — calendar month arithmetic: clamped month addition (Jan 31 + 1mo
# = Feb 29), month-end, month-start. Engines agree on the clamping
# rule, so these are H-checkable; months_between is deliberately
# EXCLUDED (Spark is fractional-by-day, DuckDB datediff counts
# boundary crossings — not the same function).
# --------------------------------------------------------------------------
@register(
    "f2_month_arithmetic",
    oracle="""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           strftime(date_trunc('month', o_orderdate) + INTERVAL 1 MONTH, '%Y-%m-%d') AS next_month_start
    FROM orders
    GROUP BY date_trunc('month', o_orderdate), last_day(o_orderdate)
    ORDER BY month_start
    """,
)
def f2_month_arithmetic(spark, sf_dir):
    T = loader(sf_dir, spark)
    return (
        T("orders")
        .groupBy(
            F.date_trunc("month", "o_orderdate").alias("mstart"),
            F.last_day("o_orderdate").alias("mend"),
        )
        .agg(F.count("*").cast("bigint").alias("n_orders"))
        .select(
            F.date_format("mstart", "yyyy-MM-dd").alias("month_start"),
            "n_orders",
            F.date_format("mend", "yyyy-MM-dd").alias("month_end"),
            F.date_format(F.add_months("mstart", 1), "yyyy-MM-dd").alias("next_month_start"),
        )
        .orderBy("month_start")
    )


# --------------------------------------------------------------------------
# R5b — chsql string/JSON/network surface: match (re2 containment),
# case/pad, JSONExtract* over the props column, IPv4 num↔string as pure
# integer expressions (round-trip asserted in-row). All JVM-side.
# --------------------------------------------------------------------------
@register(
    "r5b_chsql_strings",
    oracle="""
    SELECT event_id,
           upper(event_type) AS etype_uc,
           lpad(event_type, 10, '.') AS etype_pad,
           regexp_matches(event_type, '^(signup|error)$') AS is_se,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(event_id // 16777216 % 256 AS VARCHAR) || '.' ||
           CAST(event_id // 65536 % 256 AS VARCHAR) || '.' ||
           CAST(event_id // 256 % 256 AS VARCHAR) || '.' ||
           CAST(event_id % 256 AS VARCHAR) AS ip,
           CAST(event_id AS BIGINT) AS ip_roundtrip
    FROM events
    WHERE event_id % 7 = 0
    ORDER BY event_id
    """,
)
def r5b_chsql_strings(spark, sf_dir):
    from kompactor_spark import functions as ch

    T = loader(sf_dir, spark)
    ev = T("events").where(F.col("event_id") % 7 == 0)
    ip = ch.IPv4NumToString("event_id")
    return ev.select(
        "event_id",
        ch.ucase("event_type").alias("etype_uc"),
        ch.leftPad("event_type", 10, ".").alias("etype_pad"),
        ch.match("event_type", "^(signup|error)$").alias("is_se"),
        ch.JSONExtractInt("props", "k").alias("k"),
        ip.alias("ip"),
        ch.IPv4StringToNum(ip).alias("ip_roundtrip"),
    ).orderBy("event_id")


# --------------------------------------------------------------------------
# F13 — content-addressed row fingerprints (new round 4): a canonical
# per-row digest (md5 + sha256 over a '|'-joined canonical string of
# the row's stable columns) with a per-nation integrity census — the
# primitive behind CDC row diffing, replication verification, and
# content-addressed dedup at 100 TB (hash shuffles replace full-row
# comparisons). Only integer/string columns enter the canonical form
# (float-to-string rendering differs across engines — documented
# exclusion, same rule as the repo's money discipline). min/max digests
# give a cheap per-partition checksum pair.
# --------------------------------------------------------------------------
@register(
    "f13_row_fingerprint",
    oracle="""
    WITH h AS (
      SELECT c_nationkey,
             md5(c_name || '|' || CAST(c_custkey AS VARCHAR) || '|'
                 || CAST(c_nationkey AS VARCHAR)) AS h_md5,
             sha256(c_name || '|' || CAST(c_custkey AS VARCHAR) || '|'
                    || CAST(c_nationkey AS VARCHAR)) AS h_sha
      FROM customer)
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT h_md5) AS BIGINT) AS n_distinct,
           MIN(h_sha) AS min_sha,
           MAX(h_sha) AS max_sha
    FROM h GROUP BY c_nationkey
    ORDER BY nationkey
    """,
)
def f13_row_fingerprint(spark, sf_dir):
    T = loader(sf_dir, spark)
    canon = F.concat_ws(
        "|",
        F.col("c_name"),
        F.col("c_custkey").cast("string"),
        F.col("c_nationkey").cast("string"),
    )
    h = T("customer").select(
        "c_nationkey",
        F.md5(canon).alias("h_md5"),
        F.sha2(canon, 256).alias("h_sha"),
    )
    return (
        h.groupBy(F.col("c_nationkey").cast("bigint").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("h_md5").cast("bigint").alias("n_distinct"),
            F.min("h_sha").alias("min_sha"),
            F.max("h_sha").alias("max_sha"),
        )
        .orderBy("nationkey")
    )
