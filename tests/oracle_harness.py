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


_DUCK_INT64 = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT", "USMALLINT", "UINTEGER"}
_SPARK_INT64 = {"tinyint", "smallint", "int", "bigint"}


def _canon_duck_type(t: str) -> str:
    """Canonicalize a DuckDB type name to the driver-hash-relevant class.

    The driver's value hash is type-sensitive (CORRECTNESS_r03:
    sequence_packing had identical values but HUGEINT vs BIGINT →
    hash_match:false), so int64-compatible widths collapse to one
    class while INT128/HUGEINT and decimal-width drift stay distinct
    and fail loudly."""
    t = t.strip().upper()
    if t.endswith("[]"):
        return f"list<{_canon_duck_type(t[:-2])}>"
    if t in _DUCK_INT64:
        return "i64"
    if t in {"HUGEINT", "INT128", "UHUGEINT", "UBIGINT"}:
        return "i128"  # never matches Spark — the bug class this guards
    if t in {"FLOAT", "REAL"}:
        return "f32"
    if t == "DOUBLE":
        return "f64"
    if t in {"VARCHAR", "STRING", "TEXT"}:
        return "str"
    if t == "BOOLEAN":
        return "bool"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "ts"
    if t.startswith("DECIMAL"):
        return "dec" + t[len("DECIMAL"):].replace(" ", "")
    if t in {"BLOB", "BINARY", "BYTEA"}:
        return "bin"
    return t.lower()


def _canon_spark_type(t: str) -> str:
    t = t.strip().lower()
    if t.startswith("array<") and t.endswith(">"):
        return f"list<{_canon_spark_type(t[6:-1])}>"
    if t in _SPARK_INT64:
        return "i64"
    if t == "float":
        return "f32"
    if t == "double":
        return "f64"
    if t == "string":
        return "str"
    if t == "boolean":
        return "bool"
    if t == "date":
        return "date"
    if t.startswith("timestamp"):
        return "ts"
    if t.startswith("decimal"):
        return "dec" + t[len("decimal"):].replace(" ", "")
    if t == "binary":
        return "bin"
    return t


def compare_query(spark, con, name: str, fn, sql: str, sf_dir: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_types = dict(sdf.dtypes)
    s_rows = [tuple(r) for r in sdf.collect()]
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_types = {c: str(t) for c, t in zip(rel.columns, rel.types)}
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems
    # Result-type parity: the driver hash distinguishes types the
    # value-level compare below cannot (HUGEINT vs BIGINT, decimal
    # width). Catch promotion drift locally before it reaches the gate.
    for c in sorted(s_cols):
        sc, dc = _canon_spark_type(s_types[c]), _canon_duck_type(d_types[c])
        if sc != dc:
            problems.append(
                f"result type drift on {c!r}: spark={s_types[c]} ({sc}) "
                f"duckdb={d_types[c]} ({dc}) — driver hash is type-sensitive"
            )
    if problems:
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
