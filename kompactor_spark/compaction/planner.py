"""Compaction planner — pure driver logic, no Spark (SURVEY §3.1 c-d,
§4.2 "compaction planner").

Grouping fixes reference bug B5: the reference keyed groups by
``date_hour`` only (kompactor.ts:197-198), co-merging files of
different dbs/tables; we key by (host, db, table, date, hour).

Policy constants implement the reference's declared-but-dead intent
(kompactor.ts:26-41,53-57 — SURVEY §2.A.3 D1-D4/D8): 100 MiB target,
30/130 MiB cutoffs, 70/30 time split, 24 h generation window.
"""

from __future__ import annotations

import os
import re
from collections import defaultdict
from dataclasses import dataclass, field

from kompactor_spark.compaction.metadata import ParquetFileInfo, SnapshotMetadata

# Filename grammar (kompactor.ts:86-96): raw WAL files and compacted
# files at hour (h) or generation/day (g) level; split parts p<i>.
RAW_FILE_RE = re.compile(r"(\d{10})\.parquet$")
COMPACTED_FILE_RE = re.compile(r"c_(\d{10})_(\d{10})_[gh]\d+(?:_p\d+)?\.parquet$")
DATE_HOUR_RE = re.compile(r"(\d{4}-\d{2}-\d{2})/(\d{2})")


@dataclass
class CompactionConfig:
    """Reference constants (kompactor.ts:38-41,110)."""

    max_desired_file_size_bytes: int = 100 * 1024 * 1024  # D1
    percentage_max_file_size: int = 30  # D2
    split_percentage: int = 70  # D3
    time_window_hours: int = 24  # D4
    row_group_rows: int = 100_000  # R4 ROW_GROUP_SIZE
    compression: str = "zstd"

    @property
    def small_cutoff_bytes(self) -> int:
        """Files below this are 'small' → always worth compacting."""
        return self.max_desired_file_size_bytes * self.percentage_max_file_size // 100

    @property
    def large_cutoff_bytes(self) -> int:
        """Projected outputs above this get a 70/30 time split."""
        return (
            self.max_desired_file_size_bytes
            + self.max_desired_file_size_bytes * self.percentage_max_file_size // 100
        )


def extract_wal_sequence(filename: str) -> int:
    """WAL sequence from raw or compacted names (kompactor.ts:86-96).
    Compacted files report their FIRST wal seq → re-compaction keeps
    idempotent ordering (C16)."""
    m = RAW_FILE_RE.search(filename)
    if m:
        return int(m.group(1))
    m = COMPACTED_FILE_RE.search(filename)
    if m:
        return int(m.group(1))
    raise ValueError(f"unrecognized parquet filename: {filename!r}")


def is_compacted_file(filename: str) -> bool:
    """Level detection (reference D5 — dead and broken there, B2)."""
    return COMPACTED_FILE_RE.search(os.path.basename(filename)) is not None


@dataclass(frozen=True)
class GroupKey:
    host: str
    db_seg: str  # 'db-0' path segment
    table_seg: str  # 'table-3' path segment
    date: str  # YYYY-MM-DD
    hour: str  # HH


@dataclass
class CompactionGroup:
    key: GroupKey
    files: list[ParquetFileInfo] = field(default_factory=list)

    def sorted_files(self) -> list[ParquetFileInfo]:
        return sorted(self.files, key=lambda f: (extract_wal_sequence(os.path.basename(f.path)), f.path))

    @property
    def total_size_bytes(self) -> int:
        return sum(f.size_bytes for f in self.files)

    def output_name(self) -> str:
        s = self.sorted_files()
        first = extract_wal_sequence(os.path.basename(s[0].path))
        last = extract_wal_sequence(os.path.basename(s[-1].path))
        return f"c_{first:010d}_{last:010d}_h{int(self.key.hour)}.parquet"

    def output_relpath(self) -> str:
        """<host>/dbs/<db>/<table>/<date>/<HH-00>/<name> (kompactor.ts:224-237)."""
        k = self.key
        return os.path.join(k.host, "dbs", k.db_seg, k.table_seg, k.date, f"{k.hour}-00", self.output_name())


@dataclass
class CompactionPlan:
    groups: list[CompactionGroup]
    skipped_singletons: int = 0


def parse_group_key(host: str, file_path: str) -> GroupKey | None:
    """Path → (host, db, table, date, hour). Expects the canonical
    7-component layout (kompactor.ts:63-80); returns None for paths
    without a date/hour segment."""
    m = DATE_HOUR_RE.search(file_path)
    if not m:
        return None
    parts = file_path.split("/")
    # <host>/dbs/<db-N>/<table-N>/<date>/<HH-MM>/<file>
    if len(parts) >= 7 and parts[1] == "dbs":
        db_seg, table_seg = parts[2], parts[3]
    elif len(parts) >= 6:  # tolerate host-relative paths
        db_seg, table_seg = parts[-5], parts[-4]
    else:
        return None
    return GroupKey(host=host, db_seg=db_seg, table_seg=table_seg, date=m.group(1), hour=m.group(2))


def plan_compaction(host: str, snapshots: list[SnapshotMetadata]) -> CompactionPlan:
    """Flatten → regex-extract → group (B5 fixed) → dedup by path
    (overlapping snapshots, kompactor.ts:202-203) → drop singletons
    (kompactor.ts:213)."""
    by_key: dict[GroupKey, dict[str, ParquetFileInfo]] = defaultdict(dict)
    for snap in snapshots:
        for _db_id, _table_id, f in snap.all_files():
            key = parse_group_key(host, f.path)
            if key is not None:
                by_key[key][f.path] = f  # path-dedup across snapshots

    groups, skipped = [], 0
    for key in sorted(by_key, key=lambda k: (k.db_seg, k.table_seg, k.date, k.hour)):
        files = list(by_key[key].values())
        if len(files) <= 1:
            skipped += 1
            continue
        groups.append(CompactionGroup(key=key, files=files))
    return CompactionPlan(groups=groups, skipped_singletons=skipped)


def split_cut_times(min_time: int, max_time: int, split_percentage: int) -> int:
    """70/30 split point in ns (exact int math — B3 discipline)."""
    return min_time + (max_time - min_time) * split_percentage // 100
