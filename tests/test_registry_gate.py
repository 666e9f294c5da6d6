"""Guards for the driver correctness-gate window (registry.gate_window).

The driver records rows for only the first ``DRIVER_GATE_WINDOW``
entries of ``queries()`` (memory: driver-gate-window-50). Round 3's
static window left 79 registered queries with no driver-side signal
(VERDICT r3 "What's missing" #1), so the window now ROTATES, computed
from the committed ``CORRECTNESS_r*.json`` history. These tests pin
the rotation's invariants:

- the window is full-size and every entry carries the strong
  (oracle-hash) check;
- anything that FAILED the latest driver round is back in-window to
  re-prove its fix;
- fresh coverage is maximal: never-green queries fill the window
  before anything that already has a green row;
- the union ``window ∪ recent-green`` (green within the last
  ``RECENT_GREEN_ROUNDS`` recorded rounds) covers every §2 operator
  tag and §2.11 surface — no operator's newest driver signal goes
  more than ~RECENT_GREEN_ROUNDS rounds stale while the fresh pool
  drains.
"""

from __future__ import annotations

import peerdb_cdc_psql_psql_spark.operators  # noqa: F401
from peerdb_cdc_psql_psql_spark.registry import (
    DRIVER_GATE_WINDOW,
    RECENT_GREEN_ROUNDS,
    REGISTRY,
    REQUIRED_NAMES,
    REQUIRED_TAGS,
    _row_green,
    all_oracles,
    all_queries,
    driver_history,
    gate_window,
)


def _recent_green() -> set[str]:
    out: set[str] = set()
    for _, rows in driver_history()[-RECENT_GREEN_ROUNDS:]:
        out |= {n for n, row in rows.items() if _row_green(row)}
    return out


def _ever_green() -> set[str]:
    out: set[str] = set()
    for _, rows in driver_history():
        out |= {n for n, row in rows.items() if _row_green(row)}
    return out


def test_window_full_and_registered():
    w = gate_window()
    assert len(w) == DRIVER_GATE_WINDOW
    assert len(set(w)) == len(w)
    missing = [n for n in w if n not in REGISTRY]
    assert not missing, f"window names not in REGISTRY: {missing}"


def test_window_is_oracle_checkable():
    """Each window row should carry the strong (oracle) check — a
    rows-only row proves little; rows-only-by-design queries belong
    below the window."""
    oracles = all_oracles()
    weak = [n for n in gate_window() if n not in oracles]
    assert not weak, f"rows-only queries inside the gate window: {weak}"


def test_union_covers_all_operator_tags():
    """window ∪ recent-green must cover every §2 tag: a tag may rotate
    out only while a green row from the last RECENT_GREEN_ROUNDS
    rounds still stands."""
    covered: set[str] = set()
    for n in set(gate_window()) | (_recent_green() & set(REGISTRY)):
        covered.update(REGISTRY[n].tags)
    missing = REQUIRED_TAGS - covered
    assert not missing, f"operator tags with no driver-gate signal: {sorted(missing)}"


def test_union_covers_oracle_gated_surfaces():
    have = set(gate_window()) | _recent_green()
    missing = [n for n in sorted(REQUIRED_NAMES) if n in REGISTRY and n not in have]
    assert not missing, f"§2.11 oracle-gated queries with no signal: {missing}"


def test_latest_failures_reenter_window():
    """A driver FAIL must re-prove: the fix is unverified until a fresh
    green row lands (r3's sequence_packing is the archetype)."""
    hist = driver_history()
    if not hist:
        return
    failed = {
        n
        for n, row in hist[-1][1].items()
        if n in REGISTRY and REGISTRY[n].oracle is not None and not _row_green(row)
    }
    w = set(gate_window())
    missing = sorted(failed - w)
    assert not missing, f"latest-round failures not re-entered: {missing}"


def test_window_maximizes_fresh_coverage():
    """Never-green queries outrank already-green ones: the window must
    hold at least min(40, pool) queries with no prior green row, so
    every oracle query earns a hard driver row within ~2 rounds.
    (Floor raised 20→40 in r5 when the union invariant moved to
    recent-green — required surfaces no longer evict fresh rows.)"""
    ever = _ever_green()
    pool = [n for n, q in REGISTRY.items() if q.oracle is not None and n not in ever]
    fresh = [n for n in gate_window() if n not in ever]
    assert len(fresh) >= min(40, len(pool)), (
        f"only {len(fresh)} fresh rows in window, pool has {len(pool)}"
    )


def test_ordering_is_window_then_registration():
    names = list(all_queries())
    w = gate_window()
    assert tuple(names[: len(w)]) == w
    rest = names[len(w):]
    assert rest == [n for n in REGISTRY if n not in set(w)]


def test_window_is_deterministic():
    """The driver and pytest must compute the identical window: the
    inputs (registry order + committed CORRECTNESS files) are fixed
    within a round."""
    assert gate_window() == gate_window()
