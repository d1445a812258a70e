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


def test_ns_bucket_exact_at_boundaries(spark):
    """B3-class regression: bucketing ns epochs must be exact even where
    the double path fails (~1.7e18 > 2^53 — a float divide misroutes
    rows within ~256 ns of an hour boundary)."""
    from pyspark.sql import functions as F

    from kompactor_spark.timeutil import NS_PER_HOUR, NS_PER_US, ns_bucket, ns_floor_div

    ks = [472_222, 472_223, 500_000, 2_560_000]
    vals = [k * NS_PER_HOUR + d for k in ks for d in (-1, 0, 1, 255, -255)]
    df = spark.createDataFrame([(v,) for v in vals], "ts long")
    got = df.select(
        "ts",
        ns_bucket(F.col("ts"), NS_PER_HOUR).alias("bucket"),
        ns_floor_div(F.col("ts"), NS_PER_US).alias("us"),
    ).collect()
    for r in got:
        assert r["bucket"] == (r["ts"] // NS_PER_HOUR) * NS_PER_HOUR, r
        assert r["us"] == r["ts"] // NS_PER_US, r
    # the old float formula really is wrong on at least one of these
    bad = df.select("ts", (F.col("ts") / NS_PER_HOUR).cast("long").alias("k")).collect()
    assert any(r["k"] != r["ts"] // NS_PER_HOUR for r in bad)


def test_multiif_arity_validation():
    import pytest as _pytest

    from kompactor_spark import chsql
    from pyspark.sql import functions as F

    with _pytest.raises(ValueError):
        chsql.multiIf(F.lit(True), F.lit(1))  # no default
    with _pytest.raises(ValueError):
        chsql.multiIf(F.lit(1))  # too few args


def test_chsql_buckets_exact_at_ns_boundaries(spark):
    """toStartOfHour / toUnixTimestamp on epochs near 2^60: exact long
    math, no float drift (B3 class)."""
    from kompactor_spark import chsql

    ns = 1_740_000_000_123_456_789  # ~2025, sub-second ns tail
    df = spark.range(1).select(F.lit(ns).cast("long").alias("ts"))
    row = df.select(
        chsql.toStartOfHour("ts").alias("h"),
        chsql.toStartOfSecond("ts").alias("s"),
        chsql.toUnixTimestamp("ts").alias("u"),
        chsql.intDiv("ts", 1000).alias("us"),
    ).first()
    assert row.h == ns - ns % 3_600_000_000_000
    assert row.s == ns - ns % 1_000_000_000
    assert row.u == ns // 1_000_000_000
    assert row.us == ns // 1000


def test_read_parquet_tolerant_skips_corrupt_files(spark, tmp_path):
    """A garbage .parquet next to good files must not kill the scan in
    tolerant mode (and must kill it in strict mode, so corruption is
    never silently skippable by default)."""
    from pyspark.sql import Row

    from kompactor_spark.sources import read_parquet_tolerant

    d = str(tmp_path / "lake")
    spark.createDataFrame([Row(a=1), Row(a=2)]).coalesce(1).write.parquet(d)
    with open(f"{d}/part-corrupt.parquet", "wb") as f:
        f.write(b"PAR1 this is not a parquet file")

    with pytest.raises(Exception):
        spark.read.parquet(d).count()  # strict default: fail loudly
    assert read_parquet_tolerant(spark, d).count() == 2


def test_observed_metrics_single_pass(spark):
    """Observation metrics ride the job's only pass — data-contract
    checks (row count, null rate, bounds) without a second scan."""
    from kompactor_spark.sql_api import observed
    from kompactor_spark.tables import loader

    li = loader("/root/testdata/sf0.001", spark)("lineitem")
    df, obs = observed(
        li,
        "contract",
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("l_quantity").isNull().cast("int")).alias("null_qty"),
        F.max("l_quantity").alias("max_qty"),
    )
    written = df.where(F.col("l_quantity") > 0).count()  # the single action
    m = obs.get
    assert m["rows"] == 6000 and m["null_qty"] == 0
    assert m["max_qty"] <= 50.0
    assert written == 6000


def test_csv_json_permissive_corrupt_record_capture(spark, tmp_path):
    """S13: malformed CSV/JSON rows land in _corrupt_record instead of
    killing the scan or silently coercing — the text-format twin of
    read_parquet_tolerant. At 100 TB a landing zone always contains a
    few mangled rows; the contract is: good rows parse, bad rows are
    quarantine-able, nothing is dropped silently."""
    import pyspark.sql.types as T

    csv = tmp_path / "in.csv"
    csv.write_text("1,alice,3.5\n2,bob,oops\n3,carol,9.25\n")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    df = spark.read.schema(schema).option("mode", "PERMISSIVE").csv(str(csv)).cache()
    try:
        good = df.where(F.col("_corrupt_record").isNull())
        bad = df.where(F.col("_corrupt_record").isNotNull())
        assert {r.id for r in good.collect()} == {1, 3}
        assert [r._corrupt_record for r in bad.collect()] == ["2,bob,oops"]
    finally:
        df.unpersist()

    jl = tmp_path / "in.jsonl"
    jl.write_text('{"id": 1, "v": 2.0}\n{"id": 2, "v": broken\n{"id": 3, "v": 4.0}\n')
    jschema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.DoubleType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    jdf = spark.read.schema(jschema).json(str(jl)).cache()
    try:
        assert {r.id for r in jdf.where(F.col("_corrupt_record").isNull()).collect()} == {1, 3}
        assert jdf.where(F.col("_corrupt_record").isNotNull()).count() == 1
    finally:
        jdf.unpersist()


def _docs_fixture_dir(spark, tmp_path, rows):
    """Write a minimal documents.parquet with the given (doc_id, text)
    rows so l6_decontaminate can run against a controlled corpus."""
    sf_dir = str(tmp_path / "sf")
    spark.createDataFrame(
        [(i, t, "en", "web", len(t) if t is not None else None) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def test_l6_decontaminate_empty_probe_text_raises(spark, tmp_path):
    """An empty benchmark text yields an empty prefix; DuckDB's
    contains(x, '') is TRUE for every doc, which the windowed equi-join
    cannot express — must raise, never silently drop (ADVICE r9)."""
    from kompactor_spark.queries import all_queries

    sf_dir = _docs_fixture_dir(
        spark, tmp_path, [(0, ""), (97, "hello benchmark doc"), (1, "a corpus doc")]
    )
    with pytest.raises(ValueError, match="empty-string probe"):
        all_queries()["l6_decontaminate"](spark, sf_dir).collect()


def test_l6_decontaminate_null_probe_text_dropped_like_oracle(spark, tmp_path):
    """A NULL benchmark text is dropped — identical to the oracle's
    contains(x, NULL) = NULL join miss — so the query still runs and
    counts only real probes."""
    from kompactor_spark.queries import all_queries

    sf_dir = _docs_fixture_dir(
        spark,
        tmp_path,
        [(0, None), (97, "needle-xyz-12"), (1, "haystack with needle-xyz-12 inside"), (2, "clean")],
    )
    rows = {r.doc_id: r.n_probes_hit for r in all_queries()["l6_decontaminate"](spark, sf_dir).collect()}
    assert rows == {1: 1}


def test_engine_package_has_no_bare_asserts():
    """Kernel-guard discipline (VERDICT r9 #6 generalized): invariant
    guards in engine code must be raises, never assert statements —
    `python -O` strips asserts, turning a loud data-plane failure into
    silent corruption (e.g. the compaction single-part-file rename)."""
    import ast
    import pathlib

    import kompactor_spark

    pkg = pathlib.Path(kompactor_spark.__file__).parent
    offenders = []
    for py in sorted(pkg.rglob("*.py")):
        tree = ast.parse(py.read_text())
        offenders += [f"{py}:{n.lineno}" for n in ast.walk(tree) if isinstance(n, ast.Assert)]
    assert offenders == [], f"bare assert statements in engine code: {offenders}"
