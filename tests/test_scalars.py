"""Scalar-kernel unit tests.

The case tables port the reference's unit tests verbatim as *data*
(reference: tests/test_ai_service.py:20-87 currency/date,
tests/test_ai_service.py:90-229 validation semantics).
"""

from __future__ import annotations

import pytest

from ai_pdf_extraction_ray.functions.scalars import (
    clean_null_from_arrays,
    normalize_boolean,
    normalize_number,
    normalize_percentage,
    parse_currency,
    parse_date,
)


class TestParseCurrency:
    @pytest.mark.parametrize(
        ("raw", "expected"),
        [
            ("$1,234.56", 1234.56),
            ("1.234,56", 1234.56),       # EU grouping
            ("€1.234,56", 1234.56),
            ("£500.00", 500.0),
            ("¥1000", 1000.0),
            ("1234,56", 1234.56),        # decimal comma, 2-digit cents
            ("1,234", 1234.0),           # grouping comma
            ("1,234,567", 1234567.0),
            ("1000 USD", 1000.0),
            ("$0.99", 0.99),
            ("-$50.25", -50.25),
            ("1234.56", 1234.56),
            (1234, 1234.0),
            (12.5, 12.5),
            # symbol-anchored / locale cases the reference reaches via
            # price_parser (its validation.py:55-60) — round-4 additions
            ("1 234,56 Kč", 1234.56),    # space grouping + decimal comma
            ("1,5€", 1.5),               # 1-digit decimal comma
            ("1.234.567", 1234567.0),    # EU dot grouping, no decimals
            ("CHF 1'234.56", 1234.56),   # apostrophe grouping
            ("1.000,00 €", 1000.0),
            ("₹1,23,456.78", 123456.78),  # lakh grouping
        ],
    )
    def test_parses(self, raw, expected):
        assert parse_currency(raw) == pytest.approx(expected)

    @pytest.mark.parametrize("raw", [None, "", "   ", "not a number", "N/A", True])
    def test_unparseable(self, raw):
        assert parse_currency(raw) is None


class TestParseDate:
    @pytest.mark.parametrize(
        ("raw", "expected"),
        [
            ("2024-01-15", "2024-01-15"),            # ISO passthrough
            ("01/15/2024", "2024-01-15"),            # US
            ("15/01/2024", "2024-01-15"),            # EU fallback (month>12)
            ("03/04/2024", "2024-03-04"),            # ambiguous -> US precedence
            ("January 15, 2024", "2024-01-15"),
            ("Jan 15, 2024", "2024-01-15"),
            ("15 January 2024", "2024-01-15"),
            ("2024/01/15", "2024-01-15"),
            ("2024-01-15T10:30:00", "2024-01-15"),
            # written/dotted forms the reference reaches via dateutil
            # (its validation.py:130-135) — round-4 additions
            ("2024.01.15", "2024-01-15"),            # dotted ISO order
            ("15.01.2024", "2024-01-15"),            # dotted day-first
            ("03.04.2024", "2024-03-04"),            # dotted ambiguous -> US
            ("15th of January, 2024", "2024-01-15"),
            ("1st of March 2024", "2024-03-01"),
            ("20240115", "2024-01-15"),              # compact ISO
            # month-year -> first-of-month (deterministic, vs dateutil's
            # wall-clock-day default) — round-5 item 7
            ("Jan 2024", "2024-01-01"),
            ("January, 2024", "2024-01-01"),
            ("Dec. 2023", "2023-12-01"),
        ],
    )
    def test_parses(self, raw, expected):
        assert parse_date(raw) == expected

    @pytest.mark.parametrize("raw", [None, "", "32/13/2024", "not a date", "13/13/2024"])
    def test_unparseable(self, raw):
        assert parse_date(raw) is None


class TestNormalizers:
    def test_number(self):
        assert normalize_number("1,234") == 1234
        assert isinstance(normalize_number("1,234"), int)
        assert normalize_number("1,234.5") == 1234.5
        assert normalize_number(7) == 7
        assert normalize_number("abc") is None
        assert normalize_number(True) is None

    @pytest.mark.parametrize(
        ("raw", "expected"),
        [("true", True), ("YES", True), ("y", True), ("1", True), ("on", True),
         ("false", False), ("No", False), ("n", False), ("0", False), ("off", False),
         (True, True), (False, False), ("maybe", None), (3, None)],
    )
    def test_boolean(self, raw, expected):
        assert normalize_boolean(raw) is expected if expected is None else normalize_boolean(raw) == expected

    def test_percentage(self):
        assert normalize_percentage("15%") == 15.0
        assert normalize_percentage("7.25 %") == 7.25
        assert normalize_percentage("abc") is None

    def test_clean_null_from_arrays(self):
        data = {"a": [1, None, 2, {"b": [None, 3]}], "c": None}
        assert clean_null_from_arrays(data) == {"a": [1, 2, {"b": [3]}], "c": None}


class TestCurrencySigns:
    """Review-found sign semantics: minus after symbol, accounting parens,
    embedded dash = range (reference price-parser behaviors)."""

    @pytest.mark.parametrize(
        ("raw", "expected"),
        [("$-5", -5.0), ("($5.00)", -5.0), ("(1,234.56)", -1234.56),
         ("-€3,50", -3.5), ("$0.00", 0.0)],
    )
    def test_negative_forms(self, raw, expected):
        assert parse_currency(raw) == pytest.approx(expected)

    @pytest.mark.parametrize("raw", ["10-20", "$5-10", "2024-01-15"])
    def test_embedded_dash_is_range_not_number(self, raw):
        assert parse_currency(raw) is None
