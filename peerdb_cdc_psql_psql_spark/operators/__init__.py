"""Operator packs. Importing this package registers every query in
``peerdb_cdc_psql_psql_spark.registry``."""

from . import (  # noqa: F401
    cdc_semantics,
    joins,
    monitoring,
    relational,
    scalars,
    setops,
    windows,
)

__all__ = [
    "cdc_semantics",
    "joins",
    "monitoring",
    "relational",
    "scalars",
    "setops",
    "windows",
]
