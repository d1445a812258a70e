"""Source/sink query surface (SURVEY §2.B S2-S5, plus S7 bucketed
join and S9 JSON round-trip).

Round-trip queries: write a derived layout into the repo-local scratch
area, read it back through the engine, and prove content equivalence
against the oracle running on the original table.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from kompactor_spark.queries import register
from kompactor_spark.sources import scratch_path
from kompactor_spark.tables import loader


def _us(col: str) -> F.Column:
    """ns → µs floor (int64-exact) for DuckDB comparability."""
    return (F.col(col) - F.col(col) % 1000).alias(col)


# --------------------------------------------------------------------------
# S2 — partition-pruned scan over a Hive-style layout. The write is the
# reference's db/table/date/hour path scheme re-expressed as col=value
# partitions; the read's partition filter prunes at the scan (asserted
# in tests via the physical plan's PartitionFilters).
# --------------------------------------------------------------------------
@register(
    "s2_partition_pruned_scan",
    oracle="""
    SELECT event_id, user_id, value, epoch_ns(ts) AS ts_ns
    FROM events
    WHERE event_type = 'purchase'
    ORDER BY event_id
    """,
)
def s2_partition_pruned_scan(spark, sf_dir):
    T_ = loader(sf_dir, spark)
    tag = sf_dir.rstrip("/").split("/")[-1]
    path = scratch_path("s2_events_by_type_" + tag)
    (
        T_("events")
        .write.mode("overwrite")
        .partitionBy("event_type")
        .option("compression", "zstd")
        .parquet(path)
    )
    return (
        spark.read.parquet(path)
        .where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "value", (F.col("ts") - F.col("ts") % 1000).alias("ts_ns"))
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# S7 — bucketed co-located join: both sides bucketed on the join key at
# write time → the join runs with ZERO exchanges (plan-asserted in
# tests). The 100 TB pattern for repeatedly-joined fact tables.
# --------------------------------------------------------------------------
@register(
    "s7_bucketed_join",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def s7_bucketed_join(spark, sf_dir):
    from kompactor_spark.sources import write_bucketed

    T_ = loader(sf_dir, spark)
    tag = sf_dir.rstrip("/").split("/")[-1].replace(".", "_")
    to, tc = f"orders_b_{tag}", f"customer_b_{tag}"
    if not spark.catalog.tableExists(to):
        write_bucketed(T_("orders"), to, "o_custkey", 8, path=scratch_path(f"bkt_{to}"))
    if not spark.catalog.tableExists(tc):
        write_bucketed(T_("customer"), tc, "c_custkey", 8, path=scratch_path(f"bkt_{tc}"))
    o, c = spark.table(to), spark.table(tc)
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# S3 — JSON source: typed parse of the events.props JSON strings via
# from_json with an explicit schema (vs F7's path extraction).
# --------------------------------------------------------------------------
@register(
    "s3_json_typed_parse",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           CAST(json_valid(props) AS BOOLEAN) AS is_valid
    FROM events
    ORDER BY event_id
    """,
)
def s3_json_typed_parse(spark, sf_dir):
    T_ = loader(sf_dir, spark)
    parsed = F.from_json(F.col("props"), T.StructType([T.StructField("k", T.LongType())]))
    return (
        T_("events")
        .select(
            "event_id",
            parsed.getField("k").alias("k"),
            parsed.isNotNull().alias("is_valid"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# S4 — CSV interchange: write a projection as headered CSV, read it back
# with an explicit schema (no inference — 100 TB discipline), compare to
# the original table.
# --------------------------------------------------------------------------
@register(
    "s4_csv_roundtrip",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_orderkey <= 2000
    ORDER BY l_orderkey, l_linenumber
    """,
)
def s4_csv_roundtrip(spark, sf_dir):
    T_ = loader(sf_dir, spark)
    tag = sf_dir.rstrip("/").split("/")[-1]
    path = scratch_path("s4_lineitem_csv_" + tag)
    (
        T_("lineitem")
        .where(F.col("l_orderkey") <= 2000)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .write.mode("overwrite")
        .option("header", "true")
        .csv(path)
    )
    schema = T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
        ]
    )
    return spark.read.schema(schema).option("header", "true").csv(path).orderBy("l_orderkey", "l_linenumber")


# --------------------------------------------------------------------------
# S5 — the reference's data plane as a query: sorted single-file zstd
# Parquet sink + read-back (R1-R4, kompactor.ts:107-111). Sortedness and
# file-count invariants are asserted in tests; content here.
# --------------------------------------------------------------------------
@register(
    "s5_sorted_sink_roundtrip",
    oracle="""
    SELECT event_id, epoch_ns(ts) AS ts_ns, user_id, event_type, value
    FROM events
    ORDER BY event_id
    """,
)
def s5_sorted_sink_roundtrip(spark, sf_dir):
    from kompactor_spark.sources import write_sorted_single_file

    T_ = loader(sf_dir, spark)
    tag = sf_dir.rstrip("/").split("/")[-1]
    path = scratch_path("s5_events_sorted_" + tag)
    write_sorted_single_file(T_("events"), path, sort_col="ts")
    return (
        spark.read.parquet(path)
        .select("event_id", (F.col("ts") - F.col("ts") % 1000).alias("ts_ns"), "user_id", "event_type", "value")
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# S9 — JSON-lines sink + typed re-read round trip (interchange format;
# schema pinned on read — never inferred in the engine path)
# --------------------------------------------------------------------------
@register(
    "s9_json_sink_roundtrip",
    oracle="""
    SELECT event_id, user_id, event_type, round(value, 6) AS value
    FROM events
    WHERE event_type IN ('signup', 'error')
    ORDER BY event_id
    """,
)
def s9_json_sink_roundtrip(spark, sf_dir):
    from pyspark.sql import types as T_

    T = loader(sf_dir, spark)
    tag = sf_dir.rstrip("/").split("/")[-1]
    path = scratch_path("s9_json_" + tag)
    (
        T("events")
        .where(F.col("event_type").isin("signup", "error"))
        .select("event_id", "user_id", "event_type", F.round("value", 6).alias("value"))
        .write.mode("overwrite")
        .json(path)
    )
    schema = T_.StructType(
        [
            T_.StructField("event_id", T_.LongType()),
            T_.StructField("user_id", T_.LongType()),
            T_.StructField("event_type", T_.StringType()),
            T_.StructField("value", T_.DoubleType()),
        ]
    )
    return spark.read.schema(schema).json(path).orderBy("event_id")


# --------------------------------------------------------------------------
# S10 — ORC sink + re-read round trip (second columnar interchange
# format; zstd, schema preserved exactly so the re-read H-matches the
# parquet-sourced oracle)
# --------------------------------------------------------------------------
@register(
    "s10_orc_roundtrip",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM orders
    WHERE o_orderstatus = 'O'
    ORDER BY o_orderkey
    """,
)
def s10_orc_roundtrip(spark, sf_dir):
    T = loader(sf_dir, spark)
    tag = sf_dir.rstrip("/").split("/")[-1]
    path = scratch_path("s10_orc_" + tag)
    (
        T("orders")
        .where(F.col("o_orderstatus") == "O")
        .write.mode("overwrite")
        .option("compression", "zstd")
        .orc(path)
    )
    return (
        spark.read.orc(path)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# S11 — binaryFile source: opaque per-object binary ingestion (the raw
# landing shape for multimodal corpora — image/audio blobs in object
# storage, one object per record). The READ path is the operator:
# `spark.read.format("binaryFile")` yields (path, modificationTime,
# length, content) with one input split per object, trivially parallel
# at 100 TB. The fixture loop below only fabricates the landing files
# from the documents table (driver-side, bounded subset) — at scale the
# objects already exist; nothing in the measured path collects data.
# Content is compared as md5-over-hex (Spark base64 is MIME-wrapped —
# not DuckDB-compatible; hex is byte-identical both sides).
# --------------------------------------------------------------------------
_S11_MAX_DOC = 300


@register(
    "s11_binaryfile_source",
    oracle=f"""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           md5(hex(CAST(text AS BLOB))) AS content_md5
    FROM documents
    WHERE doc_id < {_S11_MAX_DOC}
    ORDER BY doc_id
    """,
)
def s11_binaryfile_source(spark, sf_dir):
    import os

    from kompactor_spark.sources import clear_scratch

    T_ = loader(sf_dir, spark)
    tag = sf_dir.rstrip("/").split("/")[-1]
    path = clear_scratch("s11_blobs_" + tag)
    os.makedirs(path, exist_ok=True)
    # fixture only: land one binary object per doc (bounded subset)
    for r in (
        T_("documents")
        .where(F.col("doc_id") < _S11_MAX_DOC)
        .select("doc_id", "text")
        .collect()
    ):
        with open(os.path.join(path, f"{r['doc_id']}.bin"), "wb") as fh:
            fh.write(r["text"].encode("utf-8"))
    blobs = spark.read.format("binaryFile").load(path)
    return (
        blobs.select(
            F.regexp_extract(F.col("path"), r"(\d+)\.bin$", 1)
            .cast("bigint")
            .alias("doc_id"),
            F.col("length").alias("n_bytes"),
            F.md5(F.encode(F.hex("content"), "UTF-8")).alias("content_md5"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# S12 — corrupt-file-tolerant scan: a landing directory at 100 TB
# always contains some truncated/garbage objects (failed multipart
# uploads, partial copies); `spark.sql.files.ignoreCorruptFiles`
# (here per-read via the datasource option) lets the scan skip them
# and return every row from the healthy files instead of failing the
# whole job. The fixture writes a healthy parquet subset plus a
# garbage .parquet file; the oracle is the healthy subset — so a
# regression that either fails on the bad file or silently drops good
# rows fails the compare.
# --------------------------------------------------------------------------
@register(
    "s12_corrupt_tolerant_scan",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 6) AS o_totalprice
    FROM orders
    WHERE o_orderkey <= 5000
    ORDER BY o_orderkey
    """,
)
def s12_corrupt_tolerant_scan(spark, sf_dir):
    import os

    from kompactor_spark.sources import clear_scratch

    T_ = loader(sf_dir, spark)
    tag = sf_dir.rstrip("/").split("/")[-1]
    path = clear_scratch("s12_corrupt_" + tag)
    (
        T_("orders")
        .where(F.col("o_orderkey") <= 5000)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("overwrite")
        .parquet(path)
    )
    # a truncated upload: parquet magic but garbage body and no footer
    with open(os.path.join(path, "part-corrupt.parquet"), "wb") as fh:
        fh.write(b"PAR1" + b"\x00garbage-truncated-object\x00" * 16)
    return (
        spark.read.option("ignoreCorruptFiles", "true")
        .parquet(path)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 6).alias("o_totalprice"))
        .orderBy("o_orderkey")
    )
