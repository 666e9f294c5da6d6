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
