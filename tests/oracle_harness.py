"""Local replica of the driver's correctness gate: run each registered
query in Spark AND its oracle SQL in DuckDB on the same parquet,
compare row count + column names + order-insensitive values.

Values are compared cell-exact after canonicalization (column-name
sort, row sort on the canonicalized tuple) — floats must be bit-equal,
which is the point: queries are written so both engines compute
identical IEEE values (see operators/relational.py docstring).
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

from peerdb_cdc_psql_psql_spark.catalog import FIXTURE_TABLES

FLOAT_REL_TOL = 0.0  # exact by default; the driver hashes values


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        return str(v.normalize())
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _normalize(columns: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    out = sorted(tuple(_canon(r[i]) for i in order) for r in rows)
    return cols, out


def compare_query(spark, con, name: str, fn, sql: str, sf_dir: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    d = con.execute(sql)
    d_cols = [c[0] for c in d.description]
    d_rows = d.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count: spark={len(s_rows)} duckdb={len(d_rows)}")
    cols, s_norm = _normalize(s_cols, s_rows)
    _, d_norm = _normalize(d_cols, d_rows)
    if s_norm != d_norm:
        diffs = 0
        for a, b in zip(s_norm, d_norm):
            if a != b and diffs < 3:
                problems.append(f"value diff ({cols}):\n  spark ={a}\n  duckdb={b}")
                diffs += 1
        if len(s_norm) != len(d_norm):
            problems.append("row multiset differs in size")
        if not problems:
            problems.append("value multiset differs (ordering canonicalization)")
    return problems
