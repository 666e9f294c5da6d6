"""Operator packs. Importing this package registers every query in
``peerdb_cdc_psql_psql_spark.registry``."""

from . import joins, relational, windows  # noqa: F401

__all__ = ["joins", "relational", "windows"]
