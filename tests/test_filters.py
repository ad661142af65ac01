"""F1 user filter grammar: parse matrix mirroring the reference's
``types/stream_configured_test.go:11`` cases, Catalyst semantics
(nulls, typing, and/or), and end-to-end pushdown via cmd_sync."""

from __future__ import annotations

import pytest

from olake_spark.plans.filters import (
    Condition,
    Filter,
    apply_stream_filter,
    filter_to_column,
    parse_filter,
)


def c(col, op, val):
    return Condition(column=col, operator=op, value=val)


class TestParseMatrix:
    """Each case mirrors a reference test by name."""

    CASES = [
        # (filter, conditions, logical_op)
        ("", [], ""),  # empty filter
        ("status = active", [c("status", "=", "active")], ""),  # simple unquoted
        ('"user-id" > 5', [c("user-id", ">", "5")], ""),  # quoted column
        (  # unquoted with underscores + and
            "user_id != 0 and user_name = john_doe",
            [c("user_id", "!=", "0"), c("user_name", "=", "john_doe")],
            "and",
        ),
        (  # quoted column with spaces; quoted value keeps quotes raw
            '"column name" != "some value"',
            [c("column name", "!=", '"some value"')],
            "",
        ),
        (  # two conditions, mixed quotes
            '"user-id" > 5 and status = "active"',
            [c("user-id", ">", "5"), c("status", "=", '"active"')],
            "and",
        ),
        ("age >= 18", [c("age", ">=", "18")], ""),
        ("a>b", [c("a", ">", "b")], ""),  # compact, word value
        (  # mixed quoting + or, both operand orders
            '"a" >b and a < c',
            [c("a", ">", "b"), c("a", "<", "c")],
            "and",
        ),
        ("temperature < -10", [c("temperature", "<", "-10")], ""),
        ("ratio >= .5", [c("ratio", ">=", ".5")], ""),  # leading-dot decimal
        ('name != ""', [c("name", "!=", '""')], ""),  # quoted empty string
        ("x = 1 or y = 2", [c("x", "=", "1"), c("y", "=", "2")], "or"),
        ("column123 = value456", [c("column123", "=", "value456")], ""),
        (  # excessive whitespace
            "  a   >   b   and   c   <   d  ",
            [c("a", ">", "b"), c("c", "<", "d")],
            "and",
        ),
        ("a>5and b<10", [c("a", ">", "5"), c("b", "<", "10")], "and"),
        ('description = "hello world"', [c("description", "=", '"hello world"')], ""),
        ("a = 1 and b != 2", [c("a", "=", "1"), c("b", "!=", "2")], "and"),
        ("price >= 99.99", [c("price", ">=", "99.99")], ""),
        ("age <= 100", [c("age", "<=", "100")], ""),
        (  # quoted column with dot notation
            '"user.email" = "test@example.com"',
            [c("user.email", "=", '"test@example.com"')],
            "",
        ),
        ("A > 1 AND b < 2", [c("A", ">", "1"), c("b", "<", "2")], "AND"),  # case
    ]

    @pytest.mark.parametrize("text,conds,logical", CASES)
    def test_parses(self, text, conds, logical):
        f = parse_filter(text)
        assert f == Filter(conditions=conds, logical_operator=logical)

    INVALID = [
        "invalid filter format",
        '"unclosed > 5',
        "a > 5 and b < 10 and c = 3",  # too many conditions
        '"a" >>>= b',  # invalid operator sequence
        "count = 5.",  # trailing-dot decimal
    ]

    @pytest.mark.parametrize("text", INVALID)
    def test_rejects(self, text):
        with pytest.raises(ValueError, match="invalid filter format"):
            parse_filter(text)


class TestCatalystSemantics:
    def _rows(self, spark, text):
        df = spark.createDataFrame(
            [
                (1, "active", 25, None),
                (2, "inactive", 15, 0.4),
                (3, None, 99, 0.9),
            ],
            "id int, status string, age int, ratio double",
        )
        return sorted(r["id"] for r in apply_stream_filter(df, text).collect())

    def test_empty_is_identity(self, spark):
        assert self._rows(spark, "") == [1, 2, 3]
        assert self._rows(spark, None) == [1, 2, 3]

    def test_and_or(self, spark):
        assert self._rows(spark, 'age > 18 and status = "active"') == [1]
        assert self._rows(spark, 'status = "inactive" or age > 90') == [2, 3]

    def test_null_semantics(self, spark):
        assert self._rows(spark, "status = null") == [3]
        assert self._rows(spark, "status != null") == [1, 2]
        assert self._rows(spark, "age > null") == []  # comparison with NULL: no rows

    def test_numeric_typing(self, spark):
        assert self._rows(spark, "ratio >= .5") == [3]
        assert self._rows(spark, "age <= -10") == []
        assert self._rows(spark, "age >= 99") == [3]

    def test_bare_word_is_string_literal(self, spark):
        assert self._rows(spark, "status = active") == [1]

    def test_underscored_digits_are_string_not_numeric(self, spark):
        """'1_000' matches the grammar's \\w+ arm; the reference's
        strconv parse rejects underscores so it compares as the STRING
        '1_000' — Python's looser int() must not turn it into 1000."""
        from olake_spark.plans.filters import _value_literal

        df = spark.createDataFrame([("1_000",), ("1000",)], "v string")
        got = sorted(
            r["v"] for r in apply_stream_filter(df, "v = 1_000").collect()
        )
        assert got == ["1_000"]
        # scientific notation is a bare WORD under the grammar → string
        # literal (comparing it to an int column is a loud ANSI cast
        # error, same as the reference splicing age='1e5' into SQL)
        assert self._rows(spark, "status = 1e5") == []
        assert df.filter(_value_literal("25") == 25).count() == 2
        assert df.filter(_value_literal(".5") == 0.5).count() == 2

    def test_pushdown_reaches_scan(self, spark, tmp_path):
        """The applied filter must land in the parquet scan's
        PushedFilters — the whole point of F2."""
        p = str(tmp_path / "src")
        spark.createDataFrame(
            [(i, "a" if i % 2 else "b") for i in range(100)], "id int, status string"
        ).write.parquet(p)
        df = apply_stream_filter(spark.read.parquet(p), 'status = "a" and id > 10')
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan
        assert "status" in plan.split("PushedFilters")[1][:200]

    def test_invalid_raises_before_job(self, spark):
        df = spark.range(1)
        with pytest.raises(ValueError, match="invalid filter format"):
            apply_stream_filter(df, "a > 5 and b < 10 and c = 3")

    def test_special_char_column(self, spark):
        df = spark.createDataFrame([(1, 5), (2, 20)], ["id", "user-id"])
        out = df.filter(filter_to_column(parse_filter('"user-id" > 5')))
        assert [r["id"] for r in out.collect()] == [2]
