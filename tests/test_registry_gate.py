"""Guards for the driver correctness-gate window (registry.PRIORITY).

The driver records rows for only the first ``DRIVER_GATE_WINDOW``
entries of ``queries()`` (CORRECTNESS_r01/r02 each hold exactly 50
rows in registration order). These tests pin the contract that the
window stays maximal: every SURVEY.md §2 operator tag and every
oracle-gated §2.11 surface must be covered by a query inside the
window, so no operator can silently lose its driver-side correctness
signal again (VERDICT round 1, "What's wrong" #1).
"""

from __future__ import annotations

import peerdb_cdc_psql_psql_spark.operators  # noqa: F401
from peerdb_cdc_psql_psql_spark.registry import (
    DRIVER_GATE_WINDOW,
    PRIORITY,
    REGISTRY,
    all_oracles,
    all_queries,
)

# Every §2 operator tag used in VERDICT's coverage table. S3/S6-S8,
# D1-D5, C2/C5/C7/C9, F11 are gated by pytest/bench (no query form —
# snapshot/DDL/checkpoint/restart semantics), F19 is rows-only by
# design below the window.
REQUIRED_TAGS = {
    "S1", "S2", "S9", "S10",
    "P1", "P2", "P3", "P4", "P5", "P6",
    "J1", "J2", "J3", "J4",
    "A1", "A2", "A3", "A4", "A5", "A6", "A7", "A8", "A9", "A10", "A11",
    "W1", "W2", "W3", "W4", "W5", "W6", "W7",
    "U1", "U2", "U3", "U4",
    "F1", "F2", "F3", "F4", "F5", "F6", "F7", "F9", "F10",
    "F12", "F13", "F14", "F15", "F16", "F17", "F18",
    "C1", "C3", "C4", "C6", "C8", "C10",
    "X1", "X2", "X3", "X4", "X5",
}

# §2.11 surfaces whose gate is an oracle-checked registered query.
REQUIRED_NAMES = {
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


def _window_names() -> list[str]:
    return list(all_queries())[:DRIVER_GATE_WINDOW]


def test_priority_names_all_registered():
    missing = [n for n in PRIORITY if n not in REGISTRY]
    assert not missing, f"PRIORITY names not in REGISTRY: {missing}"


def test_no_duplicate_priority_names():
    assert len(PRIORITY) == len(set(PRIORITY))


def test_window_covers_all_operator_tags():
    window = set(_window_names())
    covered = set()
    for n in window:
        covered.update(REGISTRY[n].tags)
    missing = REQUIRED_TAGS - covered
    assert not missing, f"operator tags with no driver-gate row: {sorted(missing)}"


def test_window_covers_oracle_gated_surfaces():
    window = set(_window_names())
    missing = REQUIRED_NAMES - window
    assert not missing, f"§2.11 oracle-gated queries outside window: {sorted(missing)}"


def test_window_is_oracle_checkable():
    """Each window row should carry the strong (oracle) check — a
    rows-only row proves little; rows-only-by-design queries belong
    below the window."""
    oracles = all_oracles()
    weak = [n for n in _window_names() if n not in oracles]
    assert not weak, f"rows-only queries inside the gate window: {weak}"


def test_ordering_is_priority_then_registration():
    names = list(all_queries())
    assert names[: len(PRIORITY)] == list(PRIORITY)
    rest = names[len(PRIORITY):]
    reg_rest = [n for n in REGISTRY if n not in set(PRIORITY)]
    assert rest == reg_rest
