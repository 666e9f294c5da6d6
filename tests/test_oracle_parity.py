"""Differential test: every registered oracle-checkable query must
match DuckDB exactly at sf0.01 (the driver's correctness gate scale)."""

from __future__ import annotations

import pytest

import peerdb_cdc_psql_psql_spark.operators  # noqa: F401
from peerdb_cdc_psql_psql_spark.registry import REGISTRY

from .oracle_harness import compare_query, duckdb_connection

_ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)


@pytest.fixture(scope="module")
def duck(oracle_sf_dir):
    con = duckdb_connection(oracle_sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", _ORACLE_QUERIES)
def test_oracle_parity(spark, duck, oracle_sf_dir, name):
    q = REGISTRY[name]
    problems = compare_query(spark, duck, name, q.fn, q.oracle, oracle_sf_dir)
    assert not problems, f"{name}:\n" + "\n".join(problems)


def test_rows_only_queries_return_rows(spark, oracle_sf_dir):
    """Queries without an oracle still must run and return a stable schema."""
    for name, q in REGISTRY.items():
        if q.oracle is None:
            df = q.fn(spark, oracle_sf_dir)
            assert df.columns, name
            assert df.count() >= 0, name
