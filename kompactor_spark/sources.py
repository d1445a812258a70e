"""Source/sink utilities (SURVEY §2.B S1-S6).

The engine's physical-layout policy:
- Hive-style partitioned layouts (``col=value/``) so Catalyst partition
  pruning works at the scan (SURVEY §1.3: the reference's
  db/table/date/hour path scheme maps onto this).
- zstd Parquet everywhere (reference sink option, kompactor.ts:109).
- Sorted single-file writes for hour-group compaction (reference R3-R4)
  and range-partitioned multi-file sorted writes for the 100 TB path
  (S6): ``repartitionByRange(n, key).sortWithinPartitions(key)`` gives
  globally range-sorted output without a single-node bottleneck.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame

SCRATCH_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")


def scratch_path(*parts: str) -> str:
    os.makedirs(SCRATCH_ROOT, exist_ok=True)
    return os.path.join(SCRATCH_ROOT, *parts)


def clear_scratch(*parts: str) -> str:
    p = scratch_path(*parts)
    shutil.rmtree(p, ignore_errors=True)
    return p


def write_sorted_single_file(df: DataFrame, path: str, sort_col: str = "time",
                             row_group_rows: int = 100_000) -> None:
    """Reference R3-R4 semantics: one globally time-sorted zstd Parquet
    file with bounded row groups (kompactor.ts:107-111).

    coalesce(1) is intentional — an hour-group is bounded (~100 MiB,
    reference D1) so a single writer task is correct; larger outputs
    must use write_range_sorted instead.
    """
    (
        df.coalesce(1)
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .option("compression", "zstd")
        .option("parquet.page.row.count.limit", str(row_group_rows))
        .parquet(path)
    )


def write_range_sorted(df: DataFrame, path: str, sort_col: str, num_files: int,
                       max_records_per_file: int | None = None) -> None:
    """S6: multi-file globally range-sorted write — the scale path.

    Each output file covers a disjoint range of sort_col and is sorted
    within; readers get both clustering and parallelism.
    """
    w = (
        df.repartitionByRange(num_files, sort_col)
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .option("compression", "zstd")
    )
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 8,
    path: str | None = None,
) -> None:
    """Bucketed + sorted table write (SURVEY §2.B S-layer scale path):
    two tables bucketed on the same key with the same bucket count
    join WITHOUT a shuffle — the exchange is pre-paid at write time,
    which is the right trade for fact tables joined repeatedly on the
    same key (each query saves a full shuffle of the big side).
    """
    w = (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("compression", "zstd")
    )
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)
