"""Operator packs. Importing this package registers every query in
``peerdb_cdc_psql_psql_spark.registry``."""

from . import (  # noqa: F401
    cdc_semantics,
    curation,
    dedup,
    event_time,
    joins,
    monitoring,
    pipeline,
    profiling,
    multimodal,
    relational,
    sampling,
    scalars,
    setops,
    similarity,
    sql_frontend,
    temporal,
    text_analysis,
    windows,
)

__all__ = [
    "cdc_semantics",
    "curation",
    "dedup",
    "event_time",
    "joins",
    "monitoring",
    "pipeline",
    "profiling",
    "multimodal",
    "relational",
    "sampling",
    "scalars",
    "setops",
    "similarity",
    "sql_frontend",
    "temporal",
    "text_analysis",
    "windows",
]
