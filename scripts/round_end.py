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

Usage:  python scripts/round_end.py [sim_sf_dir] [sim_only_prefix ...]

Exit status is non-zero if ANY step fails, so the round snapshot can't
silently commit stale or red evidence.
"""

from __future__ import annotations

import os
import subprocess
import sys

SCRIPTS = os.path.dirname(os.path.abspath(__file__))


def run(label: str, argv: list[str]) -> int:
    print(f"=== round_end: {label}: {' '.join(argv)}", flush=True)
    rc = subprocess.run(argv, cwd=os.path.dirname(SCRIPTS)).returncode
    print(f"=== round_end: {label}: exit {rc}", flush=True)
    return rc


def main() -> int:
    sim_args = sys.argv[1:]
    failures = 0
    failures += run(
        "driver_sim",
        [sys.executable, os.path.join(SCRIPTS, "driver_sim.py"), *sim_args],
    )
    failures += run(
        "streaming_bclass",
        [sys.executable, os.path.join(SCRIPTS, "streaming_bclass.py")],
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
