"""B-class streaming evidence artifact (VERDICT r6 #8).

The streaming twins (x19/x20/x22/x23-stream, x4 watermark late-data,
x5 stateful dedup, the x1-x3 window twins) are checked by
batch-equivalence pytest tests, not by the DuckDB oracle — so their
pass/fail never appeared in a driver-visible artifact. This script
runs exactly those tests and writes their per-test status + duration
to scripts/streaming_bclass_out.json, committed alongside the
driver-sim artifact, so every round's B-class streaming state is on
record rather than buried in a full pytest run.

Usage: python scripts/streaming_bclass.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import xml.etree.ElementTree as ET

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "streaming_bclass_out.json")


def main() -> int:
    xml_path = os.path.join(REPO, ".streaming_junit.xml")
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_streaming.py", "-q",
         f"--junitxml={xml_path}"],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    results: dict = {}
    suite_meta = {}
    try:
        root = ET.parse(xml_path).getroot()
        suite = root.find("testsuite") if root.tag == "testsuites" else root
        suite_meta = {
            "tests": int(suite.get("tests", 0)),
            "failures": int(suite.get("failures", 0)),
            "errors": int(suite.get("errors", 0)),
            "skipped": int(suite.get("skipped", 0)),
            "timestamp": suite.get("timestamp"),
        }
        for case in suite.iter("testcase"):
            status = "pass"
            notes = []
            for tag in ("failure", "error", "skipped"):
                node = case.find(tag)
                if node is not None:
                    status = tag.upper() if tag != "skipped" else "SKIPPED"
                    notes = [(node.get("message") or "")[:200]]
            results[case.get("name")] = {
                "status": status,
                "sec": round(float(case.get("time", 0)), 2),
                **({"notes": notes} if notes else {}),
            }
    except Exception as exc:  # junit parse failure: record the raw tail
        results["_parse_error"] = {
            "status": "ERR",
            "notes": [repr(exc)] + proc.stdout.splitlines()[-3:],
        }
    finally:
        if os.path.exists(xml_path):
            os.remove(xml_path)

    artifact = {
        "_meta": {
            "what": "B-class streaming twin tests (tests/test_streaming.py) — "
                    "batch-equivalence evidence for the rows the DuckDB oracle "
                    "cannot grade (X-class streaming, SURVEY §2.B X1-X5 B-checks)",
            "pytest_returncode": proc.returncode,
            **suite_meta,
        },
        "tests": results,
    }
    with open(OUT, "w") as fh:
        json.dump(artifact, fh, indent=1)
    n_bad = sum(1 for r in results.values() if r["status"] not in ("pass", "SKIPPED"))
    print(f"DONE: {len(results)} streaming tests, {n_bad} not green -> {OUT}")
    return 0 if (proc.returncode == 0 and n_bad == 0) else 1


if __name__ == "__main__":
    raise SystemExit(main())
