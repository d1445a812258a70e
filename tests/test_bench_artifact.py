"""bench.py publication hardening (VERDICT r12 #1 + ADVICE r12).

BENCH_r12.json carried ``parsed: null`` because the driver captures only
the last ~2 KB of bench stdout and the single giant artifact line had its
leading primary section truncated away. The fix prints a compact
headline-only JSON line LAST; these tests pin that the compact line (a)
always fits a 2 KB tail whole for a realistic 14-row primary, (b) carries
the headline fields, and (c) propagates the composition flag.
"""

from __future__ import annotations

import json

import bench


def _fake_primary_line(n_rows: int = 14, held: bool = True) -> dict:
    queries = {f"q{i:02d}_some_operator_name": round(1.0 + i / 7, 4) for i in range(n_rows)}
    control = {k: round(v * 1.2, 4) for k, v in queries.items()}
    line = {
        "metric": "sf1_matched_total_median_sec",
        "value": round(sum(queries.values()), 4),
        "unit": "sec",
        "queries": queries,
        "sf": 1.0,
        "duckdb_control": control,
        "same_window_ratio": 0.881,
        "control_matched_queries": n_rows,
        "max_engine_share": 0.239,
        "max_control_share": 0.278,
        "composition_rule_held": held,
        "row_notes": {k: "x" * 80 for k in queries},  # bulk the full line
        "protocol": "p" * 900,
        "sf01_appendix": {
            "total_median_sec": 9.74,
            "queries": {k: v / 10 for k, v in queries.items()},
            "duckdb_control": {k: v / 30 for k, v in queries.items()},
            "same_window_ratio": 3.58,
            "protocol": "q" * 400,
        },
    }
    if not held:
        line["sf1_skipped_on_budget"] = ["l4_repeated_ngrams"]
        line["composition_note"] = "not a clean measurement"
    return line


def test_compact_headline_fits_tail_capture():
    line = _fake_primary_line()
    assert len(json.dumps(line)) > 2048  # the full line genuinely overflows a 2 KB tail
    compact = bench._compact_headline(line)
    encoded = json.dumps(compact)
    assert len(encoded) < 2048
    parsed = json.loads(encoded)  # round-trips as one well-formed JSON line
    assert parsed["metric"] == "sf1_matched_total_median_sec"
    assert parsed["value"] == line["value"]
    assert parsed["same_window_ratio"] == 0.881
    assert parsed["max_engine_share"] == 0.239
    assert parsed["max_control_share"] == 0.278
    assert parsed["composition_rule_held"] is True
    assert len(parsed["queries"]) == 14
    assert len(parsed["ratios"]) == 14
    assert parsed["sf01_total_sec"] == 9.74
    assert parsed["full_artifact"] == "scripts/bench_out_latest.json"


def test_compact_headline_surfaces_broken_composition():
    compact = bench._compact_headline(_fake_primary_line(held=False))
    assert compact["composition_rule_held"] is False
    assert compact["sf1_skipped_on_budget"] == ["l4_repeated_ngrams"]


def test_compact_headline_engine_only_fallback():
    """The sf0.1-only fallback line (no DuckDB control) still compacts."""
    line = {
        "metric": "headline_suite_total_median_sec",
        "value": 9.74,
        "queries": {"a1_groupby_q1": 0.4},
        "sf": 0.1,
        "protocol": "x",
        "errors": {"sf1:g3_pagerank": "boom"},
    }
    compact = bench._compact_headline(line)
    assert compact["unit"] == "sec"
    assert "ratios" not in compact
    assert compact["error_keys"] == ["sf1:g3_pagerank"]


def test_compact_headline_carries_second_window_ratio():
    """VERDICT r13 #4: the appendix runs twice per session (first/last
    act); the compact trailing line must surface BOTH ratios so the
    drift bracket survives the driver's 2 KB tail capture."""
    line = _fake_primary_line()
    line["sf01_appendix"]["second_window"] = {
        "total_median_sec": 10.91,
        "queries": {},
        "same_window_ratio": 3.91,
    }
    compact = bench._compact_headline(line)
    assert compact["sf01_ratio"] == 3.58
    assert compact["sf01_ratio_w2"] == 3.91
    assert len(json.dumps(compact)) < 2048
