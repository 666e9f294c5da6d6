"""Unit tests for the wire-DML literal/statement parsing helpers
(operators/sql_frontend.py) — no Spark session needed."""

from __future__ import annotations

import pytest

from peerdb_cdc_psql_psql_spark.operators.sql_frontend import (
    _parse_sql_values,
    _split_top_level,
    _sql_literal,
)


def test_split_top_level_respects_quotes_and_parens():
    assert _split_top_level("1, 'a, b', (2, 3), 4") == [
        "1", "'a, b'", "(2, 3)", "4",
    ]
    assert _split_top_level("x = 'it''s, fine', y = 2") == [
        "x = 'it''s, fine'", "y = 2",
    ]


def test_sql_literals():
    assert _sql_literal("42") == 42
    assert _sql_literal("-3.5") == -3.5
    assert _sql_literal("NULL") is None
    assert _sql_literal("null") is None
    assert _sql_literal("TRUE") is True
    assert _sql_literal("false") is False
    assert _sql_literal("'o''brien'") == "o'brien"
    assert _sql_literal("'2024-01-02'") == "2024-01-02"
    with pytest.raises(ValueError, match="unparseable"):
        _sql_literal("bogus")


def test_parse_values_row():
    assert _parse_sql_values("3, '2024-01-02', 10, 42, 7") == [
        3, "2024-01-02", 10, 42, 7,
    ]
    assert _parse_sql_values("1, NULL, 'x, y'") == [1, None, "x, y"]


from hypothesis import given, settings, strategies as st

_VALUES = st.one_of(
    st.integers(min_value=-(10**12), max_value=10**12),
    st.none(),
    st.booleans(),
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
        max_size=30,
    ),
)


def _render(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    return "'" + v.replace("'", "''") + "'"


@settings(max_examples=50, deadline=None)
@given(vals=st.lists(_VALUES, min_size=1, max_size=8))
def test_values_roundtrip_property(vals):
    """Render arbitrary values as SQL literals → parse back → equal.
    (Strings that LOOK like other literals — '42', 'NULL' — stay
    strings because quoting wins.)"""
    rendered = ", ".join(_render(v) for v in vals)
    assert _parse_sql_values(rendered) == list(vals)


from peerdb_cdc_psql_psql_spark.operators.sql_frontend import _top_level_groups


def test_top_level_groups_quote_aware():
    """VALUES tuple extraction must not mis-split on parens inside
    string literals (ADVICE r5: 'acme (inc', ':-)')."""
    assert _top_level_groups("(1, 'acme (inc'), (2, ':-)')") == [
        "1, 'acme (inc'", "2, ':-)'",
    ]
    assert _top_level_groups("(1, 'it''s (ok)')") == ["1, 'it''s (ok)'"]
    assert _top_level_groups("(1, (2, 3), 'x')") == ["1, (2, 3), 'x'"]
    with pytest.raises(ValueError, match="unbalanced"):
        _top_level_groups("(1, 2")


@settings(max_examples=50, deadline=None)
@given(rows=st.lists(st.lists(_VALUES, min_size=1, max_size=5), min_size=1, max_size=5))
def test_tuple_groups_roundtrip_property(rows):
    """Render arbitrary VALUES rows (strings may contain parens,
    commas, quotes) → group-split → value-parse → equal."""
    rendered = ", ".join(
        "(" + ", ".join(_render(v) for v in row) + ")" for row in rows
    )
    got = [_parse_sql_values(g) for g in _top_level_groups(rendered)]
    assert got == [list(r) for r in rows]


def test_on_conflict_inside_string_literal_not_parsed():
    """A VALUES literal containing 'on conflict do nothing' text must
    not be parsed as an upsert clause (quote-parity guard)."""
    from peerdb_cdc_psql_psql_spark.operators.sql_frontend import (
        _ON_CONFLICT_RE,
    )

    raw = "(1, 'prefers on conflict do nothing')"
    m = _ON_CONFLICT_RE.search(raw)
    # regex may or may not hit; the guard is quote parity
    if m:
        assert raw[: m.start()].count("'") % 2 != 0


def test_returning_regex_never_matches_into_literal():
    from peerdb_cdc_psql_psql_spark.operators.sql_frontend import (
        _RETURNING_RE,
    )

    assert _RETURNING_RE.search(
        "INSERT INTO t VALUES (1, 'keen on returning id')"
    ) is None
    m = _RETURNING_RE.search("INSERT INTO t VALUES (1) RETURNING id, x")
    assert m and m.group(1).strip() == "id, x"
