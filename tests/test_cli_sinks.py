"""CLI (reference C1 parity) and S6 size-targeted multi-file sink."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from kompactor_spark.cli import main
from kompactor_spark.sources import write_range_sorted
from kompactor_spark.tables import load_table

from tests import fixtures_compaction as FX


def test_cli_hour_pass(spark, tmp_path, capsys):
    root = str(tmp_path / "cli")
    FX.basic_hour(root)
    rc = main([root, "--hosts", FX.HOST], spark=spark)
    assert rc == 0
    out = capsys.readouterr().out
    assert f"{FX.HOST}: compacted 1/1 groups" in out
    assert "150 rows" in out


def test_cli_dry_run_then_generation(spark, tmp_path, capsys):
    root = str(tmp_path / "clig")
    FX.multi_hour(root)
    before = sorted(glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True))
    assert main([root, "--hosts", FX.HOST, "--dry-run"], spark=spark) == 0
    assert sorted(glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True)) == before

    assert main([root, "--hosts", FX.HOST], spark=spark) == 0
    assert main([root, "--hosts", FX.HOST, "--generation"], spark=spark) == 0
    out = capsys.readouterr().out
    assert "_g" in out
    gen = [p for p in glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True) if "_g" in os.path.basename(p)]
    assert len(gen) == 1


def test_cli_requires_hosts():
    with pytest.raises(SystemExit):
        main(["/tmp/nowhere"])


def test_s6_range_sorted_multi_file(spark, tmp_path):
    """S6: multi-file write is globally range-sorted — files cover
    disjoint, increasing time ranges and are sorted within (the 100 TB
    write path: no single-writer bottleneck)."""
    events = load_table(spark, "/root/testdata/sf0.01", "events")
    out = str(tmp_path / "s6")
    write_range_sorted(events, out, sort_col="ts", num_files=4)

    parts = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    assert len(parts) == 4
    ranges = []
    total = 0
    for p in parts:
        t = pq.read_table(p, columns=["ts"]).column("ts").to_pylist()
        total += len(t)
        assert t == sorted(t), f"not sorted within: {p}"
        if t:
            ranges.append((min(t), max(t)))
    assert total == events.count()
    ranges.sort()
    for (_, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, "file ranges overlap"


def test_multimodal_resize_and_frames(spark):
    """Resize + frame-sample plumbing: schema, determinism, fan-out."""
    from kompactor_spark.operators.multimodal import (
        resize_images,
        sample_frames,
        synthesize_media,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(8)
    media = synthesize_media(docs, "doc_id", kind="video")

    resized = resize_images(media, 16, 16).collect()
    assert len(resized) == 8
    assert all(len(r.payload) == 256 and (r.width, r.height) == (16, 16) for r in resized)

    frames = sample_frames(media, every_ms=250)
    per = frames.groupBy("media_id").count().collect()
    assert len(per) == 8
    assert all(r["count"] == 4 for r in per)  # 1000ms / 250ms
    # deterministic: second run identical
    a = sorted((r.media_id, r.frame_idx) for r in frames.collect())
    b = sorted((r.media_id, r.frame_idx) for r in sample_frames(media, every_ms=250).collect())
    assert a == b


def test_cli_bootstrap_adopts_bare_layout(spark, tmp_path, capsys):
    """--bootstrap: a dbs/ tree with NO snapshot catalog is adopted
    (footer stats) and then compacted in the same invocation."""
    root = str(tmp_path / "boot")
    b = FX.LayoutBuilder(root)
    hstart = (FX.BASE_NS // (3600 * FX.NS)) * 3600 * FX.NS
    for wal in (1, 2, 3):
        rows = FX.make_rows(20, hstart + wal * 11 * FX.NS, 2000 * FX.NS, seed=wal)
        b.add_parquet(0, 3, "2025-01-26", 14, f"{wal:010d}.parquet", rows)
    # deliberately no b.write_snapshot()

    rc = main([root, "--hosts", FX.HOST, "--bootstrap"], spark=spark)
    assert rc == 0
    out = capsys.readouterr().out
    assert "bootstrapped catalog (60 rows" in out
    assert "compacted 1/1 groups" in out


def test_cli_fsck(spark, tmp_path, capsys):
    """--fsck: clean lake passes; deleting a data file or corrupting a
    stat is detected with a non-zero exit."""
    import json

    root = str(tmp_path / "fsck")
    FX.basic_hour(root)
    assert main([root, "--hosts", FX.HOST, "--fsck"], spark=spark) == 0
    assert "OK" in capsys.readouterr().out

    # compact, then damage the lake: remove one file, corrupt one stat
    main([root, "--hosts", FX.HOST], spark=spark)
    assert main([root, "--hosts", FX.HOST, "--fsck"], spark=spark) == 0
    capsys.readouterr()

    (snap_path,) = glob.glob(os.path.join(root, FX.HOST, "snapshots", "*.info.json"))
    meta = json.load(open(snap_path))
    meta["databases"][0][1]["tables"][0][1][0]["row_count"] += 1
    json.dump(meta, open(snap_path, "w"))
    assert main([root, "--hosts", FX.HOST, "--fsck"], spark=spark) == 2
    assert "stat mismatches" in capsys.readouterr().out
