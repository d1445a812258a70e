"""Local differential harness: Spark result vs DuckDB oracle (SURVEY §5.2).

Mirrors the driver's check: row count + schema-shape + order-insensitive
value comparison, with columns sorted by name. Used by tests/ to catch
mismatches before the driver does.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb

from kompactor_spark.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_spill'")  # spill outside the repo (ADVICE r9)
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _canon_value(v):
    """Canonicalize one cell for cross-engine comparison."""
    import datetime
    import decimal

    import numpy as np

    if v is None:
        return None
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return f
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (np.ndarray, list, tuple)):
        return tuple(_canon_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_value(x)) for k, x in v.items()))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    if hasattr(v, "item") and not isinstance(v, str):  # numpy scalar fallback
        return _canon_value(v.item())
    return v


def canon_rows(df) -> list[tuple]:
    """pandas.DataFrame → sorted list of canonical tuples, columns by name."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_value(v) for v in row))
    return sorted(out, key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    notes: list[str] = field(default_factory=list)


def compare_frames(name: str, spark_pdf, oracle_pdf) -> CompareResult:
    notes: list[str] = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        notes.append(f"column mismatch: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}")
        return CompareResult(name, False, len(spark_pdf), len(oracle_pdf), notes)
    s_rows, o_rows = canon_rows(spark_pdf), canon_rows(oracle_pdf)
    if len(s_rows) != len(o_rows):
        notes.append(f"row count: spark={len(s_rows)} oracle={len(o_rows)}")
        return CompareResult(name, False, len(s_rows), len(o_rows), notes)
    n_bad = 0
    for i, (a, b) in enumerate(zip(s_rows, o_rows)):
        if a != b:
            n_bad += 1
            if n_bad <= 3:
                notes.append(f"row {i}: spark={a!r} oracle={b!r}")
    if n_bad:
        notes.append(f"{n_bad}/{len(s_rows)} canonical rows differ")
    return CompareResult(name, n_bad == 0, len(s_rows), len(o_rows), notes)


def run_compare(spark, sf_dir: str, name: str, query_fn, oracle_sql: str) -> CompareResult:
    con = duck_connection(sf_dir)
    try:
        oracle_pdf = con.execute(oracle_sql).df()
    finally:
        con.close()
    spark_pdf = query_fn(spark, sf_dir).toPandas()
    return compare_frames(name, spark_pdf, oracle_pdf)
