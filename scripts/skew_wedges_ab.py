"""Skewed-graph A/B: degree-oriented vs id-oriented wedge closure.

The sf10 sweep graph is dense and near-regular, where the two
orientations do comparable work (re-measured round 9: g4 94 s vs 72 s,
g5 71 s vs 92 s — inside this VM's ambient band). The case degree
orientation exists FOR is a skewed hub: a vertex of degree d placed at
a MIDDLE id gives the id-oriented wedge join in(hub)*out(hub) ≈ d²/4
wedges, while the (degree, id) orientation directs every hub edge
INTO the hub (out-degree 0) so the hub contributes zero wedges and
total work is bounded by O(E^1.5).

This builds that adversarial-but-realistic shape (one hub + a sparse
rim — the follower-graph / celebrity-user profile), runs both plans
interleaved in one session, and prints a JSON line per run.

Usage:  python scripts/skew_wedges_ab.py [n_rim] [ab_rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def id_oriented_triangles(e):
    """The pre-round-9 shape (graph.py history): wedge join keyed on
    the id orientation's head/tail — quadratic in a mid-id hub's
    degree."""
    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    closing = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    return e1.join(e2, "b").join(closing, ["a", "c"]).select("a", "b", "c")


def main() -> None:
    n_rim = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from kompactor_spark.queries.graph import _oriented_triangles_from
    from kompactor_spark.session import get_spark

    spark = get_spark("skew-wedges-ab")
    # hub at a MIDDLE id: half the rim sorts below it, half above, so
    # the id orientation gives it in-degree ≈ out-degree ≈ n/2 and the
    # wedge join centered on it emits ≈ n²/4 rows. Rim is a path (so
    # triangles hub-i-(i+1) exist and the output is non-trivial).
    hub = n_rim // 2
    rim = [i for i in range(n_rim + 1) if i != hub]
    spokes = [(i, hub) for i in rim]
    path = [(a, b) for a, b in zip(rim, rim[1:])]
    edges = sorted({(min(a, b), max(a, b)) for a, b in spokes + path})
    e = spark.createDataFrame(edges, "u long, v long").repartition(32).cache()
    e.count()

    def run(label, fn):
        t0 = time.perf_counter()
        n = fn(e).count()
        dt = time.perf_counter() - t0
        print(
            json.dumps(
                {"plan": label, "sec": round(dt, 3), "triangles": n, "n_rim": n_rim}
            ),
            flush=True,
        )
        return dt

    # interleaved A/B (memory: never trust one window on this VM)
    for _ in range(rounds):
        run("degree_oriented", _oriented_triangles_from)
        run("id_oriented", id_oriented_triangles)
    spark.stop()


if __name__ == "__main__":
    main()
