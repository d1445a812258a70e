"""Negative-path contracts: wrong inputs fail loudly and precisely
(silent coercion at 100 TB is how corrupt lakes happen)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kompactor_spark.compaction import CompactionJob
from kompactor_spark.operators.asof import asof_join
from kompactor_spark.operators.skew import salted_agg
from kompactor_spark.tables import load_table


def test_unknown_table_raises(spark):
    with pytest.raises(KeyError, match="unknown table"):
        load_table(spark, "/root/testdata/sf0.001", "not_a_table")


def test_asof_rejects_overlapping_columns(spark):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    a = ev.select("user_id", "ts", "value")
    b = ev.select("user_id", "ts", "value")
    with pytest.raises(ValueError, match="disjoint"):
        asof_join(a, b, on="user_id", left_ts="ts", right_ts="ts")


def test_salted_agg_rejects_non_algebraic(spark):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_agg(
            ev,
            keys=["event_type"],
            aggs={"a": F.avg("value")},
            unique_cols=["event_id"],
            buckets=4,
        ).collect()


def test_compaction_missing_dirs_raise(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="data dir missing"):
        CompactionJob(spark, str(tmp_path / "nope"), ["h"]).run()
    root = tmp_path / "lake"
    (root / "host-x").mkdir(parents=True)
    with pytest.raises(FileNotFoundError, match="required dir missing"):
        CompactionJob(spark, str(root), ["host-x"]).run()
