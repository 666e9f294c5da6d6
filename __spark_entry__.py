"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship reconciliation/lag report (the
reference's signature computation, monitoring.ps1:576-627) on sf0.001.
``queries()`` / ``oracle_sql()`` are derived from the engine's query
registry — every operator pack registers its Spark callable and the
matching DuckDB oracle side by side.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import peerdb_cdc_psql_psql_spark.operators  # noqa: E402,F401  (registers queries)
from peerdb_cdc_psql_psql_spark import registry  # noqa: E402

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.REGISTRY["reconciliation_lag"].fn(spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each oracle-checkable query."""
    return registry.all_oracles()
