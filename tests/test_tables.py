"""Schema contract: every testdata table matches the pinned schema at
every scale dir (SURVEY §1.3 — schema drift at 100 TB must fail loudly,
not silently coerce)."""

from __future__ import annotations

import pytest

from kompactor_spark.tables import SCHEMAS, TABLES, UNIQUE_KEYS, load_table

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.mark.parametrize("table", TABLES)
def test_schema_pinned(spark, table):
    for sf in SF_DIRS:
        df = load_table(spark, sf, table)
        assert df.schema.simpleString() == SCHEMAS[table], f"{table}@{sf}"


@pytest.mark.parametrize("table", TABLES)
def test_unique_key_is_unique(spark, table):
    """The generated lineitem does NOT honor FIXTURES.md's
    (l_orderkey, l_linenumber) uniqueness (multiplicity up to ~6) —
    pinned here so a regenerated dataset changing that is noticed.
    Harmless for hash checks: the driver's value-hash is
    order-insensitive, and both engines see identical rows."""
    df = load_table(spark, "/root/testdata/sf0.01", table)
    keys = UNIQUE_KEYS[table]
    distinct = df.select(*keys).distinct().count()
    if table == "lineitem":
        assert distinct < df.count()
    else:
        assert df.count() == distinct, f"{table} key {keys} not unique"


def test_metadata_row_count_shapes(spark):
    """metadata_row_count answers ONLY for pure projections over a
    Parquet scan (footer-exact), returning None for every plan shape
    where footers can't speak for the result — the fallback-to-count()
    contract the dispatch gates rely on."""
    from pyspark.sql import functions as F

    from kompactor_spark.tables import metadata_row_count

    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(sf + "/documents.parquet")
    n = docs.count()
    assert metadata_row_count(docs) == n
    assert metadata_row_count(docs.select("doc_id", "text")) == n
    assert metadata_row_count(docs.where(F.col("n_chars") > 10)) is None
    assert metadata_row_count(docs.join(docs.select("doc_id"), "doc_id")) is None
    assert metadata_row_count(docs.groupBy("lang").count()) is None
    assert metadata_row_count(docs.limit(5)) is None
    assert metadata_row_count(spark.createDataFrame([(1,)], "a int")) is None
    assert metadata_row_count(docs.localCheckpoint(eager=False)) is None
