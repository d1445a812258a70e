"""Testdata table access (TESTDATA.md / FIXTURES.md §1).

Schemas are pinned explicitly (SURVEY §1.3: "pin schemas explicitly in
engine API for 100 TB safety") — we still read with footer inference
(Parquet is self-describing) but assert the contract in tests.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from kompactor_spark.session import ensure_conf

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Unique keys per table — total-order tiebreaks for hash-checked queries
# (FIXTURES.md §1).
UNIQUE_KEYS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    ensure_conf(spark)  # nanosAsLong required for events.ts (ns parquet)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def loader(sf_dir: str, spark: SparkSession):
    """Returns T(name) -> DataFrame bound to one scale dir."""

    def T(name: str) -> DataFrame:
        return load_table(spark, sf_dir, name)

    return T
