"""Unit tests for the filter algebra and SQL compiler (pure Python, no JVM).

Shapes mirror the reference suite: normalize_filters cases
(test/tables/test_util.py:108-140), filter→SQL goldens incl. escaping and
array ops (test_util.py:26-106), exactly_one_equality edge cases
(test/tables/test_table.py).
"""

import datetime as dt

import pytest

from datarepo_spark.core.filters import (
    Filter,
    exactly_one_equality_filter,
    normalize_filters,
    validate_filters,
)
from datarepo_spark.core.sql import (
    ANSI,
    CLICKHOUSE,
    SPARK,
    build_select_query,
    filter_to_sql_expr,
    filters_to_sql_predicate,
)


class TestNormalizeFilters:
    def test_none_and_empty(self):
        assert normalize_filters(None) == []
        assert normalize_filters([]) == []

    def test_flat_becomes_one_conjunction(self):
        f = Filter("a", "=", 1)
        assert normalize_filters([f]) == [[f]]
        g = Filter("b", ">", 2)
        assert normalize_filters([f, g]) == [[f, g]]

    def test_nested_passthrough(self):
        f, g = Filter("a", "=", 1), Filter("b", ">", 2)
        assert normalize_filters([[f], [g]]) == [[f], [g]]

    def test_mixed_raises(self):
        f = Filter("a", "=", 1)
        with pytest.raises(ValueError):
            normalize_filters([f, [f]])
        with pytest.raises(ValueError):
            normalize_filters([[f], f])


class TestValidate:
    def test_unknown_column(self):
        with pytest.raises(ValueError, match="Unknown filter column"):
            validate_filters([[Filter("nope", "=", 1)]], ["a", "b"])

    def test_unknown_operator(self):
        with pytest.raises(ValueError, match="Unsupported filter operator"):
            validate_filters([[Filter("a", "~~", 1)]], ["a"])

    def test_ok(self):
        validate_filters([[Filter("a", "in", [1, 2])]], ["a"])


class TestExactlyOneEquality:
    def test_simple(self):
        assert exactly_one_equality_filter("a", [[Filter("a", "=", 5)]]) == 5

    def test_all_branches_agree(self):
        dnf = [
            [Filter("a", "=", 5), Filter("b", ">", 1)],
            [Filter("a", "=", 5), Filter("b", "<", 0)],
        ]
        assert exactly_one_equality_filter("a", dnf) == 5

    def test_disagreeing_branches(self):
        dnf = [[Filter("a", "=", 5)], [Filter("a", "=", 6)]]
        assert exactly_one_equality_filter("a", dnf) is None

    def test_missing_in_one_branch(self):
        dnf = [[Filter("a", "=", 5)], [Filter("b", "=", 1)]]
        assert exactly_one_equality_filter("a", dnf) is None

    def test_non_equality(self):
        assert exactly_one_equality_filter("a", [[Filter("a", ">", 5)]]) is None

    def test_duplicate_filters_on_column(self):
        dnf = [[Filter("a", "=", 5), Filter("a", "=", 5)]]
        assert exactly_one_equality_filter("a", dnf) is None

    def test_empty(self):
        assert exactly_one_equality_filter("a", []) is None


class TestSqlGeneration:
    @pytest.mark.parametrize(
        "flt,expected",
        [
            (Filter("int_col", "=", 3), '"int_col" = 3'),
            (Filter("int_col", "!=", 3), '"int_col" != 3'),
            (Filter("int_col", "<", 3), '"int_col" < 3'),
            (Filter("int_col", "<=", 3), '"int_col" <= 3'),
            (Filter("int_col", ">", 3), '"int_col" > 3'),
            (Filter("int_col", ">=", 3), '"int_col" >= 3'),
            (Filter("str_col", "=", "x"), "\"str_col\" = 'x'"),
            (Filter("int_col", "in", [1, 2]), '"int_col" IN (1, 2)'),
            (Filter("int_col", "not in", [1, 2]), '"int_col" NOT IN (1, 2)'),
            (
                Filter("str_col", "contains", "x"),
                "\"str_col\" LIKE '%x%' ESCAPE '\\'",
            ),
            (
                Filter("list_col", "includes", 1),
                'array_contains("list_col", 1)',
            ),
            (
                Filter("list_col", "includes any", [1, 2]),
                '(array_contains("list_col", 1) OR array_contains("list_col", 2))',
            ),
            (
                Filter("list_col", "includes all", [1, 2]),
                '(array_contains("list_col", 1) AND array_contains("list_col", 2))',
            ),
        ],
    )
    def test_operator_goldens(self, flt, expected):
        assert filter_to_sql_expr(flt, ANSI) == expected

    def test_string_escaping(self):
        assert (
            filter_to_sql_expr(Filter("s", "=", "it's"), ANSI) == "\"s\" = 'it''s'"
        )
        # %/_ in the value are escaped so they match literally, not as
        # wildcards (Column.contains parity)
        assert (
            filter_to_sql_expr(Filter("s", "contains", "x'%"), ANSI)
            == "\"s\" LIKE '%x''\\%%' ESCAPE '\\'"
        )

    def test_null_handling(self):
        assert filter_to_sql_expr(Filter("a", "=", None)) == '"a" IS NULL'
        assert filter_to_sql_expr(Filter("a", "!=", None)) == '"a" IS NOT NULL'

    def test_date_literals(self):
        assert (
            filter_to_sql_expr(Filter("d", ">=", dt.date(2024, 3, 24)))
            == "\"d\" >= DATE '2024-03-24'"
        )

    def test_bool_dialects(self):
        assert filter_to_sql_expr(Filter("b", "=", True), ANSI) == '"b" = TRUE'
        assert filter_to_sql_expr(Filter("b", "=", True), CLICKHOUSE) == "`b` = 1"

    def test_clickhouse_dialect(self):
        assert (
            filter_to_sql_expr(Filter("list_col", "includes", 1), CLICKHOUSE)
            == "has(`list_col`, 1)"
        )
        assert filter_to_sql_expr(Filter("a", "=", 1), SPARK) == "`a` = 1"

    def test_backslash_dialect_escaping(self):
        # Spark/ClickHouse string literals treat backslash as an escape
        # char: a value ending in '\' must render with it doubled, or the
        # literal wouldn't terminate (parse failure / injection vector).
        for d in (SPARK, CLICKHOUSE):
            assert (
                filter_to_sql_expr(Filter("s", "=", "a\\"), d)
                == "`s` = 'a\\\\'"
            )
            assert (
                filter_to_sql_expr(Filter("s", "=", "it's"), d)
                == "`s` = 'it''s'"
            )
        # ANSI backslash stays literal
        assert (
            filter_to_sql_expr(Filter("s", "=", "a\\"), ANSI) == "\"s\" = 'a\\'"
        )

    def test_spark_like_no_escape_clause(self):
        # Spark defaults the LIKE escape char to backslash and would fail
        # to parse ESCAPE '\' (the lone backslash swallows the quote).
        got = filter_to_sql_expr(Filter("s", "contains", "x_%"), SPARK)
        assert got == "`s` LIKE '%x\\\\_\\\\%%'"
        assert "ESCAPE" not in got

    def test_dnf_predicate(self):
        dnf = [
            [Filter("a", "=", 1), Filter("b", ">", 2)],
            [Filter("c", "in", ["x"])],
        ]
        assert (
            filters_to_sql_predicate(dnf, ANSI)
            == '("a" = 1 AND "b" > 2) OR "c" IN (\'x\')'
        )
        assert filters_to_sql_predicate([], ANSI) is None

    def test_build_select_query(self):
        q = build_select_query(
            "tbl",
            columns=["a", "b"],
            filters=[[Filter("a", "=", 1)]],
            dialect=CLICKHOUSE,
        )
        assert q == "SELECT `a`, `b` FROM `tbl` WHERE `a` = 1"
        assert build_select_query("tbl") == 'SELECT * FROM "tbl"'
