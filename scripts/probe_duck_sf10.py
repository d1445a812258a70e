"""One-shot DuckDB-oracle probe at sf10 — feasibility test before a row
is admitted to the bench_sf10.py protocol (its in-process DuckDB side
has no timeout, so a DNF candidate would hang the whole bench).

Usage:  timeout 900 python scripts/probe_duck_sf10.py <query_name>
Prints one JSON line {name, sec, rows}; a shell timeout = DNF.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DST = os.path.join(ROOT, "benchdata", "sf10")


def _rp(t: str) -> str:
    path = os.path.join(DST, f"{t}.parquet")
    return f"read_parquet('{path}/*.parquet')" if os.path.isdir(path) else f"read_parquet('{path}')"


def main() -> None:
    name = sys.argv[1]
    from kompactor_spark.queries import all_oracles

    con = duckdb.connect()
    con.execute("SET threads=4")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {_rp(t)}")
    t0 = time.perf_counter()
    n = len(con.execute(all_oracles()[name]).df())
    print(json.dumps({"name": name, "sec": round(time.perf_counter() - t0, 2), "rows": n}), flush=True)


if __name__ == "__main__":
    main()
