"""g4_triangle_count: degree-oriented DuckDB twin (VERDICT r11 #4).

The registry oracle enumerates wedges on the ID-ordered edge list, so
the planted hub keeps its quadratic join key and DuckDB DNFs at sf10
(killed at 640 s / 61 GB RSS, round 10). That leaves g4 as the one
graph row without a ratio. This gives DuckDB the SAME algorithm the
engine runs (queries/graph.py::_oriented_edges/_oriented_triangles_from):
orient every edge from its lower-(degree, id) endpoint to the higher —
a total order, so each triangle has exactly one corner with two
out-edges — then wedge-join the oriented list on the shared source and
close with one oriented equi-join. Same orientation, same wedge bound
(sum of out-degree^2 = O(E^1.5)).

Twin-vs-oracle identity is asserted at sf0.01 before any timing; the
sf10 run is interleaved with the engine under the BENCH_SF10 fetch
protocol. If the twin also DNFs, the kill is recorded with a timestamp
so the DNF-win has two checkable arms.

Usage:  python scripts/g4_duck_twin.py [rounds] [duck_timeout_sec]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DST = os.path.join(ROOT, "benchdata", "sf10")
NS_PER_HOUR = 3_600_000_000_000
MIN_W = 2

# Mirrors the engine's degree-oriented enumeration 1:1. Tuple
# comparisons ((d, id) < (d, id)) are DuckDB row-value comparisons —
# the same lexicographic struct order the engine's kx struct uses.
TWIN_SQL = f"""
WITH act AS MATERIALIZED (
  SELECT DISTINCT user_id,
         epoch_ns(ts) // {NS_PER_HOUR} AS h, event_type
  FROM events),
p AS (
  SELECT a.user_id AS u, b.user_id AS v
  FROM act a JOIN act b USING (h, event_type)
  WHERE a.user_id < b.user_id),
e AS MATERIALIZED (
  SELECT u, v FROM p GROUP BY u, v
  HAVING count(*) >= {MIN_W}),
adj AS (SELECT u AS n FROM e UNION ALL SELECT v FROM e),
deg AS (SELECT n, COUNT(*) AS d FROM adj GROUP BY n),
-- MATERIALIZED: without it DuckDB inlines o into all three references
-- (recomputing the whole edge build 3x) and, with no cardinality for
-- the wedge stream, flips the EXISTS into a RIGHT_SEMI that BUILDS on
-- the wedges (measured: >50 GB RSS before kill). Materialized, o is a
-- known 1M-row build side everywhere.
o AS MATERIALIZED (
  SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS s,
         CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS x,
         CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN dv.d ELSE du.d END AS dx
  FROM e
  JOIN deg du ON du.n = e.u
  JOIN deg dv ON dv.n = e.v),
t AS (
  -- EXISTS (not a third JOIN leg): each wedge closes with at most ONE
  -- oriented edge, and a semi join builds its hash on the edge-list
  -- side (1M rows) while the wedge stream only PROBES — the plain
  -- 3-way join shape let the optimizer materialize the wedge
  -- intermediate as a build side instead (measured: 72 GB RSS + 63 GB
  -- spill before the 1800 s kill)
  SELECT o1.s AS a, o1.x AS b, o2.x AS c
  FROM o o1
  JOIN o o2 ON o1.s = o2.s AND (o1.dx, o1.x) < (o2.dx, o2.x)
  WHERE EXISTS (SELECT 1 FROM o o3 WHERE o3.s = o1.x AND o3.x = o2.x)),
corners AS (
  -- one pass over t: UNION ALL would recompute the wedge probe 3x
  SELECT unnest([a, b, c]) AS user_id FROM t)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_triangles
FROM corners GROUP BY user_id
ORDER BY n_triangles DESC, user_id
LIMIT 25
"""


def connect(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    con.execute("SET threads=4")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    ev = os.path.join(sf_dir, "events.parquet")
    src = f"{ev}/*.parquet" if os.path.isdir(ev) else ev
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{src}')")
    return con


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from kompactor_spark.queries import all_oracles, all_queries
    from kompactor_spark.session import get_spark

    # identity gate: twin == registry oracle at sf0.01 (where the
    # id-ordered oracle completes)
    small = connect("/root/testdata/sf0.01")
    a = small.execute(all_oracles()["g4_triangle_count"]).df()
    b = small.execute(TWIN_SQL).df()
    if not a.equals(b):
        raise SystemExit(f"twin != oracle at sf0.01:\n{a}\n{b}")
    print("identity gate: twin == id-ordered oracle at sf0.01", file=sys.stderr)
    small.close()

    spark = get_spark("g4-twin")
    fn = all_queries()["g4_triangle_count"]
    con = connect(DST)

    def eng() -> float:
        t0 = time.perf_counter()
        pdf = fn(spark, DST).toPandas()
        if len(pdf) < 0:
            raise AssertionError("unreachable")
        return time.perf_counter() - t0

    def dck() -> float:
        t0 = time.perf_counter()
        df = con.execute(TWIN_SQL).df()
        if len(df) < 0:
            raise AssertionError("unreachable")
        return time.perf_counter() - t0

    # warm-ups, then interleaved rounds
    eng()
    d_warm = dck()
    print(f"duck twin warm: {d_warm:.1f}s", file=sys.stderr)
    es, ds = [], []
    for r in range(rounds):
        es.append(eng())
        ds.append(dck())
        print(f"round {r}: engine {es[-1]:.1f}s duck {ds[-1]:.1f}s", file=sys.stderr)
    e, d = statistics.median(es), statistics.median(ds)
    print(
        json.dumps(
            {
                "query": "g4_triangle_count",
                "engine_sec": round(e, 2),
                "duckdb_twin_sec": round(d, 2),
                "ratio": round(e / d, 2),
                "engine_runs": [round(x, 2) for x in es],
                "duck_runs": [round(x, 2) for x in ds],
                "protocol": "BENCH_SF10 fetch, interleaved same-session; DuckDB side runs the engine's own degree-oriented algorithm (identity-gated vs the id-ordered registry oracle at sf0.01)",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
