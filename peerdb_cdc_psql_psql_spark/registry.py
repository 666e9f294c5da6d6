"""Query registry: name → (Spark callable, DuckDB oracle SQL).

Every operator from SURVEY.md §2 registers here; ``__spark_entry__.py``
derives ``queries()`` / ``oracle_sql()`` from this registry. Keeping
the Spark plan and the ANSI oracle adjacent makes the column-name
contract (identical aliases on both sides) reviewable in one screen.

Queries whose semantics are not SQL-expressible (LSH approximations,
stateful streaming) register with ``oracle=None`` → the driver records
a rows-only check (SURVEY.md §5).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, tags: tuple[str, ...] = ()):
    """Decorator: register a query function under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(
            name=name, fn=fn, oracle=oracle, doc=(fn.__doc__ or ""), tags=tags
        )
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return {n: q.fn for n, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    return {n: q.oracle for n, q in REGISTRY.items() if q.oracle is not None}
