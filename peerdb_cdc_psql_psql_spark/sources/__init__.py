"""Source/sink surfaces (SURVEY.md §2.1): typed parquet catalog
(catalog.py), CDC event log (streaming/cdc.py), text log files
(logs.py), and the DDL/DML API (ddl.py)."""

from .ddl import append_rows, create_database, create_table, verify_insert  # noqa: F401
from .logs import parse_stats_lines, read_log_dir, write_log_lines  # noqa: F401

__all__ = [
    "append_rows",
    "create_database",
    "create_table",
    "verify_insert",
    "parse_stats_lines",
    "read_log_dir",
    "write_log_lines",
]
from .layout import write_zordered, zorder_value  # noqa: F401
