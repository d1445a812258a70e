"""End-of-round evidence refresh — ONE command regenerates every
builder-side artifact that must not go stale between rounds
(VERDICT r7 #6: streaming_bclass_out.json was a one-shot artifact with
nothing re-running it per round).

Runs, in order:

1. ``scripts/driver_sim.py`` — the driver-faithful correctness sweep
   over the FULL registry at sf0.01 (writes
   ``scripts/driver_sim_out.json``); pass prefixes through to subset it
   (subset runs merge into the prior full-sweep artifact).
2. ``scripts/streaming_bclass.py`` — the B-class streaming
   batch-equivalence evidence (writes
   ``scripts/streaming_bclass_out.json`` with a fresh timestamp).
3. ``scripts/nonh_checks.py`` — per-row pass/fail for the 16 non-H
   (T/PY-class) registry rows (writes ``scripts/nonh_checks_out.json``;
   VERDICT r9 #7).
4. ``scripts/perf_smoke.py`` — the sf1 whole-registry scale smoke
   (writes ``scripts/perf_smoke_out.json``) unless ``--no-perf``.
5. ``--sweep name [name ...]`` — re-run the sf10 sweep for the named
   queries (their old rows are dropped from
   ``scripts/sweep_sf10_out.jsonl`` first so the sweep's resume logic
   re-measures them). Queries whose implementation changed this round
   MUST be re-swept here so sweep rows can't silently go stale
   (VERDICT r8 #5). ``--sweep-all`` re-runs everything (hours).

Usage:  python scripts/round_end.py [sim_sf_dir] [sim_only_prefix ...]
            [--no-perf] [--sweep name ...| --sweep-all]

Exit status is non-zero if ANY step fails, so the round snapshot can't
silently commit stale or red evidence.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SCRIPTS = os.path.dirname(os.path.abspath(__file__))
SWEEP_OUT = os.path.join(SCRIPTS, "sweep_sf10_out.jsonl")


def run(label: str, argv: list[str]) -> int:
    print(f"=== round_end: {label}: {' '.join(argv)}", flush=True)
    rc = subprocess.run(argv, cwd=os.path.dirname(SCRIPTS)).returncode
    print(f"=== round_end: {label}: exit {rc}", flush=True)
    return rc


def _drop_sweep_rows(names: list[str]) -> None:
    if not os.path.exists(SWEEP_OUT):
        return
    kept = [
        line
        for line in open(SWEEP_OUT)
        if json.loads(line).get("name") not in set(names)
    ]
    with open(SWEEP_OUT, "w") as fh:
        fh.writelines(kept)


def _assert_gate() -> int:
    """VERDICT r10 #8: the zero-bare-asserts invariant (guards must be
    raises — `python -O` strips asserts) runs as a per-round gate here,
    not only as a pytest row, so it can't regress silently between full
    suite runs. Scans the whole engine package AST."""
    import ast
    import pathlib

    pkg = pathlib.Path(os.path.dirname(SCRIPTS)) / "kompactor_spark"
    offenders = []
    for py in sorted(pkg.rglob("*.py")):
        tree = ast.parse(py.read_text())
        offenders += [
            f"{py}:{n.lineno}" for n in ast.walk(tree) if isinstance(n, ast.Assert)
        ]
    if offenders:
        print(f"=== round_end: assert_gate: FAIL {offenders}", flush=True)
        return 1
    print("=== round_end: assert_gate: 0 bare asserts package-wide", flush=True)
    return 0


def main() -> int:
    args = sys.argv[1:]
    sweep_names: list[str] = []
    sweep_all = "--sweep-all" in args
    no_perf = "--no-perf" in args
    args = [a for a in args if a not in ("--sweep-all", "--no-perf")]
    if "--sweep" in args:
        i = args.index("--sweep")
        sweep_names = args[i + 1 :]
        args = args[:i]
    sim_args = args

    failures = 0
    failures += _assert_gate()
    failures += run(
        "driver_sim",
        [sys.executable, os.path.join(SCRIPTS, "driver_sim.py"), *sim_args],
    )
    failures += run(
        "streaming_bclass",
        [sys.executable, os.path.join(SCRIPTS, "streaming_bclass.py")],
    )
    failures += run(
        "nonh_checks",
        [sys.executable, os.path.join(SCRIPTS, "nonh_checks.py")],
    )
    if not no_perf:
        failures += run(
            "perf_smoke", [sys.executable, os.path.join(SCRIPTS, "perf_smoke.py")]
        )
    if sweep_all:
        if os.path.exists(SWEEP_OUT):
            os.remove(SWEEP_OUT)
        failures += run(
            "sweep_sf10", [sys.executable, os.path.join(SCRIPTS, "sweep_sf10.py")]
        )
    elif sweep_names:
        _drop_sweep_rows(sweep_names)
        failures += run(
            "sweep_sf10", [sys.executable, os.path.join(SCRIPTS, "sweep_sf10.py")]
        )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
