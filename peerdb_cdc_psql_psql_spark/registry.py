"""Query registry: name → (Spark callable, DuckDB oracle SQL).

Every operator from SURVEY.md §2 registers here; ``__spark_entry__.py``
derives ``queries()`` / ``oracle_sql()`` from this registry. Keeping
the Spark plan and the ANSI oracle adjacent makes the column-name
contract (identical aliases on both sides) reviewable in one screen.

Queries whose semantics are not SQL-expressible (LSH approximations,
stateful streaming) register with ``oracle=None`` → the driver records
a rows-only check (SURVEY.md §5).

Driver gate window rotation
---------------------------

The driver's correctness gate records rows for only the FIRST
``DRIVER_GATE_WINDOW`` entries of ``queries()`` (memory:
driver-gate-window-50; observed in CORRECTNESS_r01..r03). With 120+
oracle-checked queries, a static window leaves a permanent blind spot
(VERDICT r3 "What's missing" #1). The window therefore ROTATES each
round, computed from the repo's own ``CORRECTNESS_r*.json`` history:

1. queries that FAILED in the latest recorded round come first (they
   must re-prove green — a fix without a fresh driver row is unproven);
2. then queries that have NEVER had a green driver row (fresh
   coverage — every oracle query earns a hard row within ~2 rounds);
3. then a constraint pass: every required §2 tag and §2.11 surface
   (tests/test_registry_gate.py) must be covered by
   ``window ∪ recent-green`` (green within the last
   ``RECENT_GREEN_ROUNDS`` recorded rounds) — if the history leaves a
   tag uncovered, its best candidate is pulled into the window.
   Recent-green (not just latest-round-green) is the coverage floor:
   with 184 oracle queries and a 50-row window, requiring every §2.11
   surface to re-prove *every single round* would evict ~26 fresh
   queries per round (observed while planning r5) and stretch full
   rotation from ~2 rounds to ~4. A surface green within the last 3
   rounds and untouched since is proven; it re-enters via rule 4
   (least-recently-green) once the fresh pool drains;
4. remaining slots fill with the least-recently-green queries.

The computation is deterministic given the committed CORRECTNESS
files (which only change between rounds), so the driver and pytest
see the identical window. With no history files (fresh checkout),
the order degrades to registration order — still a valid window.
"""

from __future__ import annotations

import glob
import json
import os
import re
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
    # True when CONSTRUCTING the DataFrame already runs Spark jobs
    # (iterative collect loops, index/table writes, ML fits) — such
    # queries are not free to register as SQL views (ADVICE r3).
    eager_build: bool = False


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    eager_build: bool = False,
):
    """Decorator: register a query function under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(
            name=name, fn=fn, oracle=oracle, doc=(fn.__doc__ or ""), tags=tags,
            eager_build=eager_build,
        )
        return fn

    return deco


DRIVER_GATE_WINDOW = 50

# How many trailing recorded rounds count as "recent" for the union
# coverage invariant (window ∪ recent-green ⊇ required tags/names).
# 3 ≈ the staleness bound on any surface's newest driver row while
# the fresh-coverage rotation is still draining the never-green pool.
RECENT_GREEN_ROUNDS = 3

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# §2 operator tags that must be covered by window ∪ latest-green
# every round (the union invariant: nothing loses its driver signal
# for more than one round). S3/S6-S8, D1-D5, C2/C5/C7/C9, F11 are
# gated by pytest/bench (no query form); F8 is inside scalar_suite.
REQUIRED_TAGS = frozenset(
    {
        "S1", "S2", "S9", "S10",
        "P1", "P2", "P3", "P4", "P5", "P6",
        "J1", "J2", "J3", "J4",
        "A1", "A2", "A3", "A4", "A5", "A6", "A7", "A8", "A9", "A10", "A11",
        "W1", "W2", "W3", "W4", "W5", "W6", "W7",
        "U1", "U2", "U3", "U4",
        "F1", "F2", "F3", "F4", "F5", "F6", "F7", "F9", "F10",
        "F12", "F13", "F14", "F15", "F16", "F17", "F18", "F19",
        "C1", "C3", "C4", "C6", "C8", "C10",
        "X1", "X2", "X3", "X4", "X5",
    }
)

# §2.11 surfaces whose gate is a specific oracle-checked query.
REQUIRED_NAMES = frozenset(
    {
        "infra_health_bands",       # L2
        "dedup_clusters",           # L10
        "keyword_search",           # L11
        "decontaminate_corpus",     # L15
        "pii_pseudonymize",         # L16
        "dedup_incremental_ledger", # L17
        "repetition_stats",         # L18
        "curation_funnel",          # L19
        "sequence_packing",         # L20
        "key_skew_profile",         # L21
        # custom operators + composed pipeline (north-star)
        "asof_last_signup",
        "sessionization",
        "range_join_incident_windows",
        "hypertable_rollup",
        "training_data_pipeline",
        "train_val_split",
    }
)


def driver_history() -> list[tuple[int, dict]]:
    """Committed driver gate results, oldest→newest: [(round, rows)]."""
    out = []
    for path in glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", os.path.basename(path))
        if not m:
            continue
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if isinstance(rows, dict):
            out.append((int(m.group(1)), rows))
    out.sort(key=lambda t: t[0])
    return out


def _row_green(row: dict) -> bool:
    """A driver row counts as green only on the strong check: the
    type-sensitive value hash (rows_match alone proved too weak —
    CORRECTNESS_r03 sequence_packing had rows/schema green, hash red)."""
    return bool(row.get("hash_match")) and row.get("err") in (None, "")


def gate_window() -> tuple[str, ...]:
    """The first DRIVER_GATE_WINDOW names of ``queries()`` — the
    rotated driver gate window (see module docstring)."""
    return tuple(n for n, _ in _ordered()[:DRIVER_GATE_WINDOW])


def _ordered() -> list[tuple[str, Query]]:
    hist = driver_history()
    ever_green: set[str] = set()
    last_green: dict[str, int] = {}
    for rnd, rows in hist:
        for name, row in rows.items():
            if _row_green(row):
                ever_green.add(name)
                last_green[name] = rnd
    latest_rows = hist[-1][1] if hist else {}
    latest_failed = {
        n for n, row in latest_rows.items() if not _row_green(row) and n in REGISTRY
    }
    recent_green: set[str] = set()
    for rnd, rows in hist[-RECENT_GREEN_ROUNDS:]:
        recent_green |= {n for n, row in rows.items() if _row_green(row)}

    reg_index = {n: i for i, n in enumerate(REGISTRY)}
    candidates = [n for n, q in REGISTRY.items() if q.oracle is not None]

    def sort_key(n: str):
        return (
            0 if n in latest_failed else 1,   # re-prove fixes first
            0 if n not in ever_green else 1,  # fresh coverage next
            last_green.get(n, 0),             # least-recently-green
            reg_index[n],                     # stable tiebreak
        )

    ranked = sorted(candidates, key=sort_key)
    window: list[str] = ranked[:DRIVER_GATE_WINDOW]

    # Constraint pass: window ∪ recent_green must cover every required
    # tag and name. Pull the best-ranked provider of anything missing,
    # evicting from the back (the back of the ranked fill is the
    # most-recently-green, safest to defer).
    def covered_tags(names) -> set[str]:
        out: set[str] = set()
        for n in names:
            out.update(REGISTRY[n].tags)
        return out

    have = set(window) | recent_green
    need_names = [n for n in sorted(REQUIRED_NAMES) if n in REGISTRY and n not in have]
    need_tags = REQUIRED_TAGS - covered_tags(have & set(REGISTRY))
    pulls: list[str] = list(need_names)
    for tag in sorted(need_tags):
        options = [n for n in ranked if tag in REGISTRY[n].tags and n not in window]
        if options and not any(tag in REGISTRY[p].tags for p in pulls):
            pulls.append(options[0])
    for p in pulls:
        if p in window:
            continue
        for i in range(len(window) - 1, -1, -1):
            evict = window[i]
            # never evict a forced-in (failed/required/needed) name.
            # A REQUIRED name sitting in the window is only safe to
            # defer if it is recent-green (it keeps its signal via the
            # window ∪ recent_green union); evicting one that entered
            # via the least-recently-green fill would drop its signal
            # entirely — the r10 bug (VERDICT r10 "What's wrong" #1).
            if (
                evict in latest_failed
                or evict in pulls
                or (evict in REQUIRED_NAMES and evict not in recent_green)
            ):
                continue
            trial = window[:i] + [p] + window[i + 1 :]
            # the eviction must not itself uncover a required tag OR
            # name the evicted entry was the sole window∪recent_green
            # provider of.
            union = set(trial) | (recent_green & set(REGISTRY))
            if evict in REQUIRED_NAMES and evict not in union:
                continue
            still = covered_tags(union)
            if all(t in still for t in REGISTRY[evict].tags if t in REQUIRED_TAGS):
                window = trial
                break

    window_set = set(window)
    rest = [n for n in REGISTRY if n not in window_set]
    return [(n, REGISTRY[n]) for n in window + rest]


def all_queries() -> dict[str, QueryFn]:
    return {n: q.fn for n, q in _ordered()}


def all_oracles() -> dict[str, str]:
    return {n: q.oracle for n, q in _ordered() if q.oracle is not None}
