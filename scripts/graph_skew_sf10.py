"""Skewed sf10-grain graph fixture for the PUBLISHED g4/g5 rows.

VERDICT r9 #4: the sweep's sf10 co-occurrence graph is dense and
near-regular, where degree- and id-orientation do comparable work by
construction — so the published 94 s / 71 s rows measure the bench
artifact, not the orientation round 9 built. The shape the orientation
exists FOR (skew_wedges_ab.py) lived only in a side script.

This builds a REALISTIC skewed events fixture at the sf10 grain
(~10 M event rows) and publishes g4/g5 rows measured on it:

- **power-law communities**: community sizes Pareto(x_m=3, alpha=2)
  capped at 20 (mean ~5); every member is active in that community's
  two private (hour, event_type) buckets, so each community becomes a
  w=2 clique in the G1 co-occurrence graph. Heavy-tailed degrees, the
  follower-graph profile.
- **a planted mid-id hub** (the adversarial case): one user co-active
  with HUB_DEG=50k rim users spread uniformly across the id space, two
  private buckets per spoke, plus a rim path so hub triangles exist.
  Under id orientation the hub splits in/out ~25k/25k and the wedge
  join emits ~6.25e8 rows ON ONE JOIN KEY (a single-task straggler);
  under (degree, id) orientation every hub edge points INTO the hub —
  zero wedges through it, O(E^1.5) total bound regardless of skew.

Everything is deterministic (hash-seeded DuckDB SQL, no RNG state).

Phases (run separately so DNF candidates sit under a shell `timeout`):
  gen     — write benchdata/graph_skew/events.parquet (~10 M rows)
  engine  — registry g4_triangle_count + g5_neighbor_jaccard on the
            fixture, full sweep sink protocol, N interleaved runs
  ab      — same-session interleaved A/B of the two triangle plans
            (degree-oriented vs the pre-round-9 id-oriented shape) on
            one checkpointed edge frame; run the id side under
            `timeout` from the shell if you want a DNF bound instead
  duck    — DuckDB g4 wedge-oracle twin on the fixture (expected DNF:
            its edge list is id-ordered u<v, so the mid-id hub is the
            same 6.25e8-wedge key) — run under `timeout 600`.

Usage:  python scripts/graph_skew_sf10.py gen|engine|ab|ab_id_only|duck ...

Set GRAPH_SKEW_SCALE=small for the 1/10-grain twin fixture (~1 M
events, hub degree 15 k) — the scale where DuckDB's wedge oracle can
actually FINISH, so g4 gets a measured ratio to complement the
sf10-grain DNF bound (same generator, same skew profile).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMALL = os.environ.get("GRAPH_SKEW_SCALE", "") == "small"
FIX = os.path.join(ROOT, "benchdata", "graph_skew_small" if SMALL else "graph_skew")
EVENTS = os.path.join(FIX, "events.parquet")
SINK = f"/tmp/graph_skew_sink_{os.getpid()}.parquet"

N_USERS = 100_000 if SMALL else 400_000
N_COMM = 100_000 if SMALL else 1_000_000
COMM_CAP = 20
HUB_DEG = 15_000 if SMALL else 50_000
HUB_ID = 30_001 if SMALL else 100_001  # odd: never collides with the rim's ids (0 mod 4)
NS_PER_HOUR = 3_600_000_000_000


def gen() -> None:
    import duckdb

    os.makedirs(FIX, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    # Pareto(3, alpha=2) via inverse CDF on a hash-uniform, capped at
    # COMM_CAP. Mean ~5 members; P(s>=20) ~ 2.25% — heavy-tailed degrees
    # (the follower-graph profile) without any single clique exploding
    # C(s,3), so the PLANTED HUB stays the dominant skew and the A/B
    # measures the orientation, not the background.
    con.execute(f"""
        CREATE TEMP TABLE comm AS
        SELECT c,
               LEAST({COMM_CAP}, CAST(FLOOR(3.0 / SQRT((1 + hash(c * 40503) % 1000000) / 1000001.0)) AS INT)) AS s
        FROM range({N_COMM}) t(c)
    """)
    # members: hash-picked from the id space; duplicates inside one
    # community collapse via DISTINCT (slightly shrinks s — fine)
    con.execute(f"""
        CREATE TEMP TABLE members AS
        SELECT DISTINCT c, CAST(hash(c * 1000003 + j * 7919) % {N_USERS} AS BIGINT) AS user_id
        FROM comm, range({COMM_CAP}) r(j) WHERE j < s
    """)
    # rim user k = 4k (uniform over the id space, all != HUB_ID);
    # spokes hub—rim_k in private buckets, path rim_k—rim_(k+1) in
    # private buckets (hub—k—(k+1) triangles exist => non-trivial output)
    con.execute(f"""
        CREATE TEMP TABLE hub_pairs AS
        SELECT k, CAST({HUB_ID} AS BIGINT) AS a, CAST(4 * k AS BIGINT) AS b,
               {2 * N_COMM} + 4 * k AS h0
        FROM range({HUB_DEG}) t(k)
        UNION ALL
        SELECT k, CAST(4 * k AS BIGINT), CAST(4 * k + 4 AS BIGINT),
               {2 * N_COMM} + 4 * k + 2
        FROM range({HUB_DEG - 1}) t(k)
    """)
    con.execute(f"""
        COPY (
          WITH ev AS (
            SELECT m.user_id, (2 * m.c + b.b) AS h, 'c' AS event_type
            FROM members m CROSS JOIN (VALUES (0), (1)) b(b)
            UNION ALL
            SELECT u.u, (p.h0 + b.b) AS h, 'h' AS event_type
            FROM hub_pairs p
            CROSS JOIN (VALUES (0), (1)) b(b)
            CROSS JOIN LATERAL (VALUES (p.a), (p.b)) u(u)
          )
          SELECT row_number() OVER () AS event_id,
                 CAST(h * {NS_PER_HOUR} AS BIGINT) AS ts,
                 user_id,
                 event_type,
                 CAST((hash(user_id * 31 + h) % 1000) / 10.0 AS DOUBLE) AS value,
                 '{{}}' AS props
          FROM ev
        ) TO '{EVENTS}' (FORMAT PARQUET, COMPRESSION ZSTD, ROW_GROUP_SIZE 1000000)
    """)
    n, nu = con.execute(
        f"SELECT count(*), count(DISTINCT user_id) FROM read_parquet('{EVENTS}')"
    ).fetchone()
    print(json.dumps({"phase": "gen", "events": n, "users": nu}), flush=True)


def _spark():
    from kompactor_spark.session import get_spark

    return get_spark("graph-skew-sf10")


def _drop_checkpoint_blocks(spark) -> None:
    """Unpersist every block-store RDD (localCheckpoint copies) between
    runs: each g4/g5 run checkpoints the 16.8M-edge frame + the oriented
    frame (~1 GB of UnsafeRows together) and the ContextCleaner does not
    release the previous run's copies before the next run allocates —
    run 1 died with a driver-heap OOM on the 8g session (round 11).
    Same lesson as crossdoc's accumulating 30M-row checkpoints."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for jrdd in jmap.values():
        jrdd.unpersist(True)


def engine(runs: int = 3) -> None:
    from kompactor_spark.queries import all_queries

    spark = _spark()
    qs = all_queries()
    for i in range(runs):
        for name in ("g4_triangle_count", "g5_neighbor_jaccard"):
            t0 = time.perf_counter()
            qs[name](spark, FIX).write.mode("overwrite").parquet(SINK)
            n = spark.read.parquet(SINK).count()
            dt = time.perf_counter() - t0
            shutil.rmtree(SINK, ignore_errors=True)
            print(json.dumps({"phase": "engine", "name": name, "run": i,
                              "sec": round(dt, 2), "rows": n}), flush=True)
            _drop_checkpoint_blocks(spark)
    spark.stop()


def _edges_checkpointed(spark):
    from kompactor_spark.queries.graph import _cooccurrence_edges

    e = _cooccurrence_edges(spark, FIX).select("u", "v").localCheckpoint()
    print(json.dumps({"phase": "edges", "n_edges": e.count()}), flush=True)
    return e


def _id_oriented_triangles(e):
    """The pre-round-9 wedge shape: joins keyed on the id orientation,
    quadratic in the mid-id hub's degree (skew_wedges_ab.py)."""
    from pyspark.sql import functions as F

    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    closing = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    return e1.join(e2, "b").join(closing, ["a", "c"]).select("a", "b", "c")


def ab(rounds: int = 2, id_side: bool = True) -> None:
    from kompactor_spark.queries.graph import _oriented_triangles_from

    spark = _spark()
    e = _edges_checkpointed(spark)

    def run(label, fn):
        t0 = time.perf_counter()
        n = fn(e).count()
        print(json.dumps({"phase": "ab", "plan": label, "sec": round(time.perf_counter() - t0, 2),
                          "triangles": n}), flush=True)

    for _ in range(rounds):
        run("degree_oriented", _oriented_triangles_from)
        if id_side:
            run("id_oriented", _id_oriented_triangles)
    spark.stop()


def duck(names=("g4_triangle_count", "g5_neighbor_jaccard")) -> None:
    import duckdb

    from kompactor_spark.queries import all_oracles

    oracles = all_oracles()
    con = duckdb.connect()
    con.execute("SET threads=4")  # BASELINE.md §2 protocol
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    # fixture stores epoch-ns BIGINT; the registry oracles expect the
    # driver's TIMESTAMP encoding (they call epoch_ns(ts)) — present it
    # (hour-aligned ns, so the micros cast is exact)
    con.execute(f"""
        CREATE VIEW events AS
        SELECT event_id, make_timestamp(ts // 1000) AS ts,
               user_id, event_type, value, props
        FROM read_parquet('{EVENTS}')
    """)
    for name in names:
        t0 = time.perf_counter()
        rows = con.execute(oracles[name]).fetchall()
        print(json.dumps({"phase": "duck", "name": name,
                          "sec": round(time.perf_counter() - t0, 2),
                          "rows": len(rows)}), flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "gen"
    if mode == "gen":
        gen()
    elif mode == "engine":
        engine(int(sys.argv[2]) if len(sys.argv) > 2 else 3)
    elif mode == "ab":
        ab()
    elif mode == "ab_deg_only":
        ab(rounds=2, id_side=False)
    elif mode == "ab_id_only":
        from kompactor_spark.queries.graph import _oriented_triangles_from  # noqa: F401

        spark = _spark()
        e = _edges_checkpointed(spark)
        t0 = time.perf_counter()
        n = _id_oriented_triangles(e).count()
        print(json.dumps({"phase": "ab", "plan": "id_oriented",
                          "sec": round(time.perf_counter() - t0, 2), "triangles": n}), flush=True)
        spark.stop()
    elif mode == "duck":
        duck(tuple(sys.argv[2:]) or ("g4_triangle_count", "g5_neighbor_jaccard"))
    else:
        raise SystemExit(f"unknown mode {mode!r}")
