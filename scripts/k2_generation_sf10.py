"""K2 generation-level compaction at sf10 grain (VERDICT r10 #6).

K1's hour merge got its at-scale twin in round 10
(`scripts/k_compact_sf10.py`, 0.73x); the leveled daily path — the
reference's dead-code intent D1-D4/D8 (kompactor.ts:38-57: 70/30
split, 100 MB max-desired, 130 MB large cutoff, `g` filename level) —
was only property-tested at toy scale. This runs `run_generation` on a
REAL-SIZE fixture at the actual reference constants and asserts the
split invariants on the bytes that actually land on disk:

fixture (built from benchdata/sf10 events, deterministic):
  day A = 40 M rows (4x the 10 M-row fixture, ts remapped onto one
          day) as 24 zstd hour-compacted files, ~208 MB total — above
          the 130 MB large cutoff, so the planner must 70/30-split;
  day B = 2 M rows (~10 MB) as 4 hour files — below every cutoff, so
          the merge must produce ONE unsplit g-file.

asserted after the timed run (real footer stats + real st_size):
  - split arity matches compute_split_cuts on the inputs' real sizes
  - per-part time ranges partition the day at the planner's cut times
    (disjoint, ordered, boundary-exact)
  - every part internally time-sorted; row conservation per day
  - leading part's byte share ~= split_percentage of the day total
    (the D3 uniform-density projection, checked against real bytes)
  - catalog: snapshots reference exactly the files on disk (P4)

Usage:  python scripts/k2_generation_sf10.py [--keep]
Prints one JSON line with wall-times + measured split geometry.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF10_EVENTS = os.path.join(ROOT, "benchdata", "sf10", "events.parquet")
FIX = os.path.join(ROOT, "benchdata", "k2_generation")
HOST = "host-a"
NS = 1_000_000_000
NS_DAY = 86_400 * NS
DAY_A = "2025-01-26"
DAY_B = "2025-01-27"
DAY_A_NS = 1_737_849_600 * NS  # 2025-01-26T00:00Z
DAY_B_NS = DAY_A_NS + NS_DAY


def _hour_file_sql(con, sel_sql: str, date: str, hour: int, seq: int) -> dict:
    rel = f"{HOST}/dbs/db-0/table-0/{date}/{hour:02d}-00/c_{seq:010d}_{seq:010d}_h{hour}.parquet"
    abs_path = os.path.join(FIX, rel)
    os.makedirs(os.path.dirname(abs_path), exist_ok=True)
    con.execute(
        f"COPY ({sel_sql} ORDER BY time) TO '{abs_path}' "
        "(FORMAT PARQUET, COMPRESSION ZSTD, ROW_GROUP_SIZE 100000)"
    )
    md = pq.ParquetFile(abs_path).metadata
    tmin = tmax = None
    for rg in range(md.num_row_groups):
        for ci in range(md.num_columns):
            col = md.row_group(rg).column(ci)
            if col.path_in_schema == "time" and col.statistics and col.statistics.has_min_max:
                s = col.statistics
                tmin = s.min if tmin is None else min(tmin, s.min)
                tmax = s.max if tmax is None else max(tmax, s.max)
    return {
        "path": rel,
        "size_bytes": os.path.getsize(abs_path),
        "row_count": md.num_rows,
        "chunk_time": tmin,
        "min_time": tmin,
        "max_time": tmax,
    }


def build_fixture() -> None:
    if os.path.isdir(FIX):
        shutil.rmtree(FIX)
    os.makedirs(os.path.join(FIX, HOST, "snapshots"))
    os.makedirs(os.path.join(FIX, HOST, "dbs"))
    con = duckdb.connect()
    con.execute("SET threads=8")
    con.execute(
        f"""CREATE VIEW ev AS
        WITH b AS (SELECT min(epoch_ns(ts)) mn, max(epoch_ns(ts)) mx
                   FROM read_parquet('{SF10_EVENTS}'))
        SELECT event_id, user_id, event_type, value,
               epoch_ns(ts) AS raw_ns, mn, mx
        FROM read_parquet('{SF10_EVENTS}') CROSS JOIN b"""
    )
    infos = []
    seq = 1
    # day A: 4 replicas of the 10M rows, each remapped onto one quarter
    # of the day (deterministic int math) -> 40M rows across 24 hours
    for rep in range(4):
        lo = DAY_A_NS + rep * (NS_DAY // 4)
        span = NS_DAY // 4 - 1
        for hq in range(6):  # 6 hours per quarter-day
            hour = rep * 6 + hq
            sel = (
                f"SELECT {lo} + CAST(CAST(raw_ns - mn AS HUGEINT) * {span} // (mx - mn) AS BIGINT) AS time, "
                f"event_id + {rep}*100000000 AS event_id, user_id, event_type, value "
                f"FROM ev WHERE ({lo} + CAST(CAST(raw_ns - mn AS HUGEINT) * {span} // (mx - mn) AS BIGINT) - {DAY_A_NS}) "
                f"// {3600 * NS} = {hour}"
            )
            infos.append({"db": 0, "table": 0, "info": dict(_hour_file_sql(con, sel, DAY_A, hour, seq), id=seq)})
            seq += 1
    # day B: 2M rows over 4 hours — below every cutoff, single g-file path
    for hour in range(4):
        lo = DAY_B_NS
        span = 4 * 3600 * NS - 1
        sel = (
            f"SELECT {lo} + CAST(CAST(raw_ns - mn AS HUGEINT) * {span} // (mx - mn) AS BIGINT) AS time, "
            f"event_id, user_id, event_type, value FROM ev "
            f"WHERE event_id % 5 = 0 AND "
            f"({lo} + CAST(CAST(raw_ns - mn AS HUGEINT) * {span} // (mx - mn) AS BIGINT) - {DAY_B_NS}) // {3600 * NS} = {hour}"
        )
        infos.append({"db": 0, "table": 0, "info": dict(_hour_file_sql(con, sel, DAY_B, hour, seq), id=seq)})
        seq += 1
    con.close()

    dbs: dict[int, dict[int, list[dict]]] = {}
    for e in infos:
        dbs.setdefault(e["db"], {}).setdefault(e["table"], []).append(e["info"])
    all_i = [e["info"] for e in infos]
    meta = {
        "writer_id": HOST,
        "parquet_size_bytes": sum(i["size_bytes"] for i in all_i),
        "row_count": sum(i["row_count"] for i in all_i),
        "min_time": min(i["min_time"] for i in all_i),
        "max_time": max(i["max_time"] for i in all_i),
        "databases": [
            [db, {"tables": [[t, files] for t, files in sorted(tables.items())]}]
            for db, tables in sorted(dbs.items())
        ],
    }
    with open(os.path.join(FIX, HOST, "snapshots", "0001.info.json"), "w") as fh:
        json.dump(meta, fh, indent=2)


def main() -> None:
    keep = "--keep" in sys.argv
    if not os.path.exists(SF10_EVENTS):
        raise SystemExit("benchdata/sf10 missing — run scripts/bench_sf10.py once")

    t0 = time.perf_counter()
    build_fixture()
    t_fixture = time.perf_counter() - t0

    from kompactor_spark.compaction import CompactionJob
    from kompactor_spark.compaction.metadata import read_snapshot
    from kompactor_spark.compaction.planner import CompactionConfig, compute_split_cuts
    from kompactor_spark.session import get_spark

    cfg = CompactionConfig()  # the REAL reference constants (D1-D4)
    # record the planner's expectation from the inputs' real sizes
    snap = read_snapshot(os.path.join(FIX, HOST, "snapshots", "0001.info.json"))
    by_day: dict[str, list] = {}
    for _db, _t, f in snap.all_files():
        by_day.setdefault(f.path.split("/")[4], []).append(f)
    expect = {}
    for day, files in by_day.items():
        total = sum(f.size_bytes for f in files)
        tmin = min(f.min_time for f in files)
        tmax = max(f.max_time for f in files)
        cuts = compute_split_cuts(tmin, tmax, total, cfg)
        expect[day] = {
            "input_files": len(files),
            "input_bytes": total,
            "input_rows": sum(f.row_count for f in files),
            "cuts": cuts,
            "expected_parts": len(cuts) + 1,
            "tmin": tmin,
            "tmax": tmax,
        }

    spark = get_spark("k2-generation-sf10")
    job = CompactionJob(spark, FIX, [HOST], config=cfg, time_col="time", parallelism=2)
    t0 = time.perf_counter()
    reports = job.run_generation(now_ns=None)
    t_run = time.perf_counter() - t0

    # ---- invariants on real bytes --------------------------------------
    out = {"fixture_sec": round(t_fixture, 2), "generation_sec": round(t_run, 2), "days": {}}
    for day, exp in expect.items():
        parts = sorted(
            glob.glob(os.path.join(FIX, HOST, "dbs", "db-0", "table-0", day, "c_*_g*.parquet"))
        )
        if len(parts) != exp["expected_parts"]:
            raise SystemExit(f"{day}: {len(parts)} parts on disk, planner expected {exp['expected_parts']}")
        sizes, ranges, rows = [], [], 0
        for p in parts:
            md = pq.ParquetFile(p).metadata
            rows += md.num_rows
            t = pq.read_table(p, columns=["time"]).column("time").to_numpy()
            if not (t[:-1] <= t[1:]).all():
                raise SystemExit(f"{p}: not time-sorted")
            ranges.append((int(t[0]), int(t[-1])))
            sizes.append(os.path.getsize(p))
        if rows != exp["input_rows"]:
            raise SystemExit(f"{day}: row conservation violated {rows} != {exp['input_rows']}")
        ranges.sort()
        for i in range(len(ranges) - 1):
            if ranges[i][1] > ranges[i + 1][0]:
                raise SystemExit(f"{day}: overlapping part ranges {ranges}")
        # boundary-exact split: part i's max <= cut_i < part i+1's min
        for i, cut in enumerate(exp["cuts"]):
            if not (ranges[i][1] <= cut < ranges[i + 1][0] + 1):
                raise SystemExit(f"{day}: part boundary {ranges[i][1]} vs planner cut {cut}")
        day_out = {
            "parts": len(parts),
            "part_bytes": sizes,
            "part_ranges_ns": ranges,
            "output_rows": rows,
            **{k: exp[k] for k in ("input_files", "input_bytes", "input_rows", "cuts")},
        }
        if exp["cuts"]:
            # D3 projection check on real bytes: leading part's share of
            # the output ~= split_percentage (uniform-density data)
            share = sizes[0] / sum(sizes)
            day_out["leading_part_byte_share"] = round(share, 3)
            if not 0.55 <= share <= 0.85:
                raise SystemExit(f"{day}: leading part share {share:.3f} far from 0.70 projection")
        out["days"][day] = day_out

    # P4: catalog references exactly the files on disk
    cataloged = set()
    for sp in sorted(glob.glob(os.path.join(FIX, HOST, "snapshots", "*.info.json"))):
        s = read_snapshot(sp)
        cataloged |= {f.path for _, _, f in s.all_files()}
    on_disk = {
        os.path.relpath(p, FIX)
        for p in glob.glob(os.path.join(FIX, HOST, "dbs", "**", "*.parquet"), recursive=True)
    }
    if cataloged != on_disk:
        raise SystemExit(f"catalog/disk drift: {cataloged ^ on_disk}")

    print(json.dumps(out), flush=True)
    spark.stop()
    if not keep:
        shutil.rmtree(FIX, ignore_errors=True)


if __name__ == "__main__":
    main()
