"""Per-round freshness artifact for the non-H registry rows (VERDICT
r9 #7).

The 15 never-driver-graded rows (plus a3, whose driver grade is a
permanent `no_oracle` by design) are covered by T/PY/B-class pytest
checks inside the full suite — but nothing surfaced their individual
pass/fail per round the way driver_sim does for H rows, so a tolerance
regression would be buried in a 600-test run. This script runs exactly
the binding check for each row and writes
``scripts/nonh_checks_out.json`` (row -> test ids + status) for the
round bundle.

The mapping is asserted complete against the registry's check-class
annotations: a new oracle-less row without an entry here fails loudly.
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys
import xml.etree.ElementTree as ET

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "scripts", "nonh_checks_out.json")

# row -> the pytest node id(s) that BIND the row's declared check class
# (the test the check= annotation points at; see check_notes()).
BINDING = {
    "a3_approx_count_distinct": ["tests/test_tolerance.py::test_a3_approx_count_distinct_tolerance"],
    "a9b_approx_percentiles": ["tests/test_tolerance.py::test_a9b_approx_percentiles_tolerance"],
    "a17_hll_sketch_merge": ["tests/test_tolerance.py::test_a17_hll_sketch_merge_tolerance"],
    "a18_kll_quantile_merge": ["tests/test_tolerance.py::test_a18_kll_quantile_merge_tolerance"],
    "a19_theta_set_sketch": ["tests/test_tolerance.py::test_a19_theta_set_sketch_tolerance"],
    "a19b_theta_difference": ["tests/test_tolerance.py::test_a19b_theta_difference_tolerance"],
    "l2_minhash_banded": [
        "tests/test_tolerance.py::test_l2_minhash_banded_recall_precision",
        "tests/test_scale_smoke.py::test_minhash_banded_at_scale",
    ],
    "l2_minhash_lsh": [
        "tests/test_tolerance.py::test_l2_minhash_lsh_recall",
        "tests/test_scale_smoke.py::test_minhash_lsh_at_scale",
    ],
    "l2_simhash_pairs": ["tests/test_tolerance.py::test_l2_simhash_pairs_quality_bounds"],
    "l3_ivf_topk": ["tests/test_tolerance.py::test_l3_ivf_topk_recall"],
    "l3_lsh_topk": ["tests/test_tolerance.py::test_l3_lsh_topk_recall"],
    "l4_bpe_train": ["tests/test_round4_ops.py::test_bpe_train_matches_pure_python_reference"],
    "l5_audio_features": [
        "tests/test_multimodal.py::test_audio_features_match_sine_ground_truth",
        "tests/test_multimodal.py::test_l5_audio_features_query",
    ],
    "l5_media_features": [
        "tests/test_multimodal.py::test_bmp_golden_bytes",
        "tests/test_multimodal.py::test_feature_pipeline_py_oracle",
    ],
    "l6_stratified_sample": ["tests/test_tolerance.py::test_l6_stratified_sample_rates"],
    "x15_sketch_rollup": ["tests/test_rollup.py::test_rollup_reaggregation_matches_direct"],
}


def main() -> int:
    sys.path.insert(0, ROOT)
    from kompactor_spark.queries import all_oracles, all_queries

    oracle_less = set(all_queries()) - set(all_oracles())
    unmapped = sorted(oracle_less - set(BINDING))
    if unmapped:
        print(f"nonh_checks: oracle-less rows with no binding test mapping: {unmapped}", file=sys.stderr)
        return 1

    node_ids = sorted({t for tests in BINDING.values() for t in tests})
    xml_path = os.path.join(ROOT, "scripts", ".nonh_junit.xml")
    rc = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "--tb=line", f"--junitxml={xml_path}", *node_ids],
        cwd=ROOT,
    ).returncode

    status: dict[str, str] = {}
    for case in ET.parse(xml_path).getroot().iter("testcase"):
        nid = f"{case.get('classname', '').replace('.', '/')}.py::{case.get('name')}"
        bad = case.find("failure") is not None or case.find("error") is not None
        skipped = case.find("skipped") is not None
        status[nid] = "fail" if bad else ("skip" if skipped else "pass")
    os.remove(xml_path)

    rows = {}
    for row, tests in sorted(BINDING.items()):
        st = [status.get(t, "missing") for t in tests]
        rows[row] = {
            "tests": tests,
            "status": "pass" if all(s == "pass" for s in st) else "fail",
            "per_test": dict(zip(tests, st)),
        }
    out = {
        "generated": datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds"),
        "rows": rows,
        "all_pass": all(r["status"] == "pass" for r in rows.values()),
    }
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"nonh_checks: {sum(r['status'] == 'pass' for r in rows.values())}/{len(rows)} pass -> {OUT}")
    return 0 if (rc == 0 and out["all_pass"]) else 1


if __name__ == "__main__":
    raise SystemExit(main())
