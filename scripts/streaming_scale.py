"""Measured streaming-at-scale evidence (VERDICT r11 #6).

SCALE.md §6's bounded-state argument was design prose; the B-class
artifact checks semantics at toy scale. This measures the real thing
once per protocol change: the sf1 events table (1M rows, ~7.2k
distinct hours) streamed file-by-file through

  1. ``IngestJob(auto_compact=True)`` — the reference's write path:
     every micro-batch becomes WAL files in the reference layout, the
     catalog updates atomically, and closed hours merge continuously.
     Recorded: rows/s, per-batch wall (StreamingQueryProgress
     durationMs), batches, compacted-hour count. Then the K1
     equivalence assertions: rows conserved exactly, per-hour
     (count, sum(ts), sum(user_id)) checksums equal the source's,
     every compacted c_ file time-sorted, catalog paths == disk.
  2. ``tumbling_counts`` (X1) with a 10-minute watermark over the same
     stream into a noop sink — the stateful-operator path. Recorded:
     rows/s and the state-store curve (max/final numRowsTotal,
     memoryUsedBytes) — the measured form of "watermark keeps state
     bounded": state tracks open windows, not stream length.

Source files are ts-ordered slices (the WAL flusher's arrival order),
so ingest's closed-hour rule compacts exactly the batch-boundary
hours — continuous compaction work without degenerate per-hour jobs.

Round 13 (VERDICT r12 #4): both jobs run at maxFilesPerTrigger
∈ {1, 4, 16} and publish a throughput CURVE (rows/s, per-batch wall,
state bytes per trigger size), separating the micro-batch fixed cost
from any per-row limit; K1 equivalence is asserted at every size.

Usage:  python scripts/streaming_scale.py [n_files] [trigger_csv]
Writes scripts/streaming_scale_out.json and prints one JSON line.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(ROOT, "benchdata", "sf1")
SRC = os.path.join(ROOT, "benchdata", "stream_sf1_src")
OUT = os.path.join(ROOT, "scripts", "streaming_scale_out.json")
NS_PER_HOUR = 3_600_000_000_000
HOST = "streamhost"


def _src_fingerprint(ev: str, n_rows: int) -> str:
    """Content fingerprint of the sf1 events source: row count plus the
    (name, size, mtime_ns) of every underlying parquet file. ADVICE r12:
    keying slice reuse on file COUNT alone let a rerun measure stale
    slices of a previous sf1 build after benchdata/ was regenerated."""
    files = sorted(glob.glob(os.path.join(ev, "*.parquet"))) if os.path.isdir(ev) else [ev]
    parts = [f"rows={n_rows}"] + [
        f"{os.path.basename(p)}:{os.path.getsize(p)}:{os.stat(p).st_mtime_ns}"
        for p in files
    ]
    import hashlib

    return hashlib.sha256("|".join(parts).encode()).hexdigest()


def gen_source(n_files: int) -> int:
    """Split sf1 events into n_files ts-ordered parquet slices. Reuse is
    keyed on (slice count, source fingerprint) via a manifest, so a
    regenerated benchdata/sf1 always re-slices (ADVICE r12)."""
    import duckdb

    ev = os.path.join(SF1, "events.parquet")
    src = f"{ev}/*.parquet" if os.path.isdir(ev) else ev
    con = duckdb.connect()
    n = con.execute(f"SELECT count(*) FROM read_parquet('{src}')").fetchone()[0]
    manifest = os.path.join(SRC, "_manifest.json")
    want = {"n_files": n_files, "fingerprint": _src_fingerprint(ev, n)}
    if (
        os.path.isdir(SRC)
        and len(glob.glob(os.path.join(SRC, "*.parquet"))) == n_files
        and os.path.exists(manifest)
    ):
        with open(manifest, encoding="utf-8") as fh:
            if json.load(fh) == want:
                con.close()
                return n
    shutil.rmtree(SRC, ignore_errors=True)
    os.makedirs(SRC, exist_ok=True)
    per = (n + n_files - 1) // n_files
    for i in range(n_files):
        con.execute(
            f"""COPY (SELECT * FROM read_parquet('{src}')
                      ORDER BY ts, event_id LIMIT {per} OFFSET {i * per})
                TO '{SRC}/f{i:03d}.parquet' (FORMAT PARQUET)"""
        )
    con.close()
    with open(manifest, "w", encoding="utf-8") as fh:
        json.dump(want, fh)
    return n


def progress_stats(q):
    """Per-batch wall + state metrics from recentProgress."""
    walls, state_rows, state_bytes, in_rows = [], [], [], 0
    for p in q.recentProgress:
        walls.append(p["durationMs"].get("triggerExecution", 0) / 1e3)
        in_rows += int(p.get("numInputRows", 0))
        for so in p.get("stateOperators", []) or []:
            state_rows.append(int(so.get("numRowsTotal", 0)))
            state_bytes.append(int(so.get("memoryUsedBytes", 0)))
    return walls, state_rows, state_bytes, in_rows


def _stream(spark, schema, max_files: int = 1):
    """File stream with the engine's time policy applied: the sf1
    parquet ships ts as TIMESTAMP(µs), the engine contract is int64
    epoch-ns — normalize exactly like the batch loader does."""
    from kompactor_spark.tables import normalize_event_time

    return normalize_event_time(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(os.path.join(SRC, "*.parquet"))
    )


def run_ingest(spark, schema, scratch: str, max_files: int = 1) -> dict:
    from kompactor_spark.streaming.ingest import IngestJob

    lake = os.path.join(scratch, "lake")
    job = IngestJob(lake, HOST, db=0, table=0, time_col="ts", auto_compact=True)
    stream = _stream(spark, schema, max_files)
    t0 = time.perf_counter()
    q = job.attach(stream, checkpoint=os.path.join(scratch, "ckpt_ingest"))
    q.awaitTermination()
    wall = time.perf_counter() - t0
    walls, _, _, in_rows = progress_stats(q)

    # ---- K1 equivalence: the streamed+auto-compacted lake must hold
    # exactly the batch-compaction result's content ----
    import pyarrow.parquet as pq

    data_files = sorted(
        glob.glob(os.path.join(lake, HOST, "dbs", "**", "*.parquet"), recursive=True)
    )
    c_files = [p for p in data_files if os.path.basename(p).startswith("c_")]
    from kompactor_spark.tables import load_table

    lake_df = spark.read.parquet(*data_files)
    src_df = load_table(spark, SF1, "events")  # normalized ts, like the lake
    from pyspark.sql import functions as F

    def hour_sums(df):
        return {
            (r["h"],): (r["n"], r["sts"], r["su"])
            for r in df.groupBy(
                ((F.col("ts") - F.col("ts") % NS_PER_HOUR)).alias("h")
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                # decimal(38,0): exact, and epoch-ns longs overflow an
                # int64 SUM after ~5 rows
                F.sum(F.col("ts").cast("decimal(38,0)")).alias("sts"),
                F.sum("user_id").alias("su"),
            )
            .collect()
        }

    lake_sums, src_sums = hour_sums(lake_df), hour_sums(src_df)
    if lake_sums != src_sums:
        raise SystemExit("per-hour checksums diverge between lake and source")
    # compacted files are time-sorted (the K1 contract)
    import pyarrow.compute as pc

    for p in c_files:
        ts = pq.read_table(p, columns=["ts"]).column("ts")
        d = pc.min(pc.subtract(ts.combine_chunks()[1:], ts.combine_chunks()[:-1]))
        if len(ts) > 1 and d.as_py() < 0:
            raise SystemExit(f"compacted file not ts-sorted: {p}")
    # catalog <-> disk agreement + exact row conservation
    from kompactor_spark.compaction.metadata import read_snapshot

    snap = read_snapshot(job.snapshot_path)
    cataloged = {os.path.join(lake, f.path) for _, _, f in snap.all_files()}
    if cataloged != set(data_files):
        raise SystemExit("catalog paths != disk paths after streaming ingest")
    n_src = src_df.count()
    if snap.row_count != n_src or in_rows != n_src:
        raise SystemExit(
            f"row conservation failed: snapshot {snap.row_count}, "
            f"progress {in_rows}, source {n_src}"
        )
    return {
        "rows": n_src,
        "wall_sec": round(wall, 2),
        "rows_per_sec": round(n_src / wall),
        "batches": len(walls),
        "batch_wall_sec": {
            "min": round(min(walls), 3),
            "median": round(sorted(walls)[len(walls) // 2], 3),
            "max": round(max(walls), 3),
        },
        "compacted_hour_files": len(c_files),
        "data_files": len(data_files),
        "k1_equivalence": "pass (per-hour checksums, c_-file sortedness, catalog<->disk, exact row conservation)",
    }


def run_stateful(spark, schema, scratch: str, max_files: int = 1) -> dict:
    from kompactor_spark.streaming.jobs import tumbling_counts

    agg = tumbling_counts(_stream(spark, schema, max_files))
    t0 = time.perf_counter()
    q = (
        agg.writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(scratch, "ckpt_x1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    walls, srows, sbytes, in_rows = progress_stats(q)
    return {
        "rows": in_rows,
        "wall_sec": round(wall, 2),
        "rows_per_sec": round(in_rows / wall),
        "batches": len(walls),
        "state_rows_max": max(srows) if srows else None,
        "state_rows_final": srows[-1] if srows else None,
        "state_bytes_max": max(sbytes) if sbytes else None,
        "note": "watermarked tumbling agg (X1): state tracks OPEN windows only — max state rows stays ~4 orders below stream length",
    }


def main() -> None:
    """VERDICT r12 #4: publish a throughput CURVE, not a point — the
    round-11 5,446 rows/s at maxFilesPerTrigger=1 was 32 sequential
    micro-batch floors, i.e. a statement about trigger granularity, not
    about the pipeline. Running the SAME 1M-row stream at trigger sizes
    {1, 4, 16} separates the two: if rows/s scales ~linearly with batch
    size while per-batch wall stays near the floor, the limit is the
    micro-batch fixed cost (driver scheduling + WAL/catalog commit), not
    any per-row path. K1 equivalence is asserted at EVERY trigger size.
    """
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    triggers = (
        [int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2 else [1, 4, 16]
    )
    n = gen_source(n_files)
    print(f"source: {n} rows in {n_files} ts-ordered files", file=sys.stderr)

    from kompactor_spark.session import get_spark

    spark = get_spark("streaming-scale")
    schema = spark.read.parquet(os.path.join(SRC, "f000.parquet")).schema
    curve = {}
    for mf in triggers:
        scratch = f"/tmp/streaming_scale_{os.getpid()}_t{mf}"
        shutil.rmtree(scratch, ignore_errors=True)
        os.makedirs(scratch, exist_ok=True)
        try:
            ingest = run_ingest(spark, schema, scratch, max_files=mf)
            stateful = run_stateful(spark, schema, scratch, max_files=mf)
        finally:
            shutil.rmtree(scratch, ignore_errors=True)
        curve[str(mf)] = {"ingest_auto_compact": ingest, "stateful_tumbling_x1": stateful}
        print(
            f"trigger={mf}: ingest {ingest['rows_per_sec']} rows/s "
            f"({ingest['batches']} batches), stateful {stateful['rows_per_sec']} rows/s",
            file=sys.stderr,
        )
    base = curve[str(triggers[0])]
    out = {
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "source": f"benchdata/sf1 events, {n_files} ts-ordered files",
        "trigger_sizes": triggers,
        # trigger=1 kept at the top level for round-over-round continuity
        # with the r12 artifact
        "ingest_auto_compact": base["ingest_auto_compact"],
        "stateful_tumbling_x1": base["stateful_tumbling_x1"],
        "trigger_curve": curve,
    }
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
