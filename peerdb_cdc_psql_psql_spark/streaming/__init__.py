"""Structured Streaming CDC core (SURVEY.md §2.9 / §7 M3)."""

from .cdc import (  # noqa: F401
    CDC_EVENT_SCHEMA,
    Mirror,
    TableMapping,
    read_target,
    snapshot_load,
    start_mirror,
)

__all__ = [
    "CDC_EVENT_SCHEMA",
    "Mirror",
    "TableMapping",
    "read_target",
    "snapshot_load",
    "start_mirror",
]
