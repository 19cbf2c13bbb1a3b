"""Property-based three-way equivalence of the filter compilers.

For random rows + random DNF filters, the Python reference semantics, the
Spark Column compiler, and the DuckDB-executed SQL compiler must select the
same row ids. This is what guarantees a filter means the same thing on the
parquet path (Column) and the pushdown paths (SQL) — including LIKE
metacharacter escaping and quote handling.
"""

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datarepo_spark.core.compile import filters_to_column
from datarepo_spark.core.filters import Filter, normalize_filters
from datarepo_spark.core.sql import DUCKDB, SPARK, filters_to_sql_predicate

# Strings exercising quoting/escaping/wildcards; values are never NULL so
# the Python model avoids SQL three-valued logic.
STRINGS = st.text(
    alphabet="ab%_'\\ 0",
    min_size=0,
    max_size=6,
)
INTS = st.integers(min_value=-50, max_value=50)

ROWS = st.lists(
    st.tuples(INTS, STRINGS),
    min_size=1,
    max_size=20,
)

COMPARISON_OPS = ["=", "!=", "<", "<=", ">", ">="]


@st.composite
def single_filter(draw):
    kind = draw(st.sampled_from(["int_cmp", "str_cmp", "in", "not in", "contains"]))
    if kind == "int_cmp":
        return Filter("a", draw(st.sampled_from(COMPARISON_OPS)), draw(INTS))
    if kind == "str_cmp":
        return Filter(
            "s", draw(st.sampled_from(["=", "!="])), draw(STRINGS)
        )
    if kind == "in":
        return Filter("a", "in", draw(st.lists(INTS, min_size=1, max_size=4)))
    if kind == "not in":
        return Filter(
            "a", "not in", draw(st.lists(INTS, min_size=1, max_size=4))
        )
    return Filter("s", "contains", draw(STRINGS))


DNF = st.lists(
    st.lists(single_filter(), min_size=1, max_size=3),
    min_size=1,
    max_size=3,
)


def py_eval_filter(row, f: Filter) -> bool:
    value = row[0] if f.column == "a" else row[1]
    if f.operator == "=":
        return value == f.value
    if f.operator == "!=":
        return value != f.value
    if f.operator == "<":
        return value < f.value
    if f.operator == "<=":
        return value <= f.value
    if f.operator == ">":
        return value > f.value
    if f.operator == ">=":
        return value >= f.value
    if f.operator == "in":
        return value in f.value
    if f.operator == "not in":
        return value not in f.value
    if f.operator == "contains":
        return str(f.value) in str(value)
    raise AssertionError(f.operator)


def py_eval(rows, dnf) -> set[int]:
    return {
        i
        for i, row in enumerate(rows)
        if any(all(py_eval_filter(row, f) for f in conj) for conj in dnf)
    }


@given(rows=ROWS, dnf=DNF)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_duckdb_sql_matches_python(rows, dnf):
    ndnf = normalize_filters(dnf)
    expected = py_eval(rows, ndnf)
    pdf = pd.DataFrame(
        {"i": range(len(rows)), "a": [r[0] for r in rows],
         "s": [r[1] for r in rows]}
    )
    pred = filters_to_sql_predicate(ndnf, DUCKDB)
    con = duckdb.connect()
    con.register("t", pdf)
    got = {
        r[0]
        for r in con.execute(f"SELECT i FROM t WHERE {pred}").fetchall()
    }
    con.close()
    assert got == expected


# The Spark leg runs far fewer examples (a distributed job per example);
# rows/filters are still drawn from the same strategies.
@given(rows=ROWS, dnf=DNF)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_spark_column_matches_python(spark, rows, dnf):
    ndnf = normalize_filters(dnf)
    expected = py_eval(rows, ndnf)
    df = spark.createDataFrame(
        [(i, r[0], r[1]) for i, r in enumerate(rows)], ["i", "a", "s"]
    )
    got = {
        r.i for r in df.filter(filters_to_column(ndnf)).select("i").collect()
    }
    assert got == expected


# The SPARK-dialect SQL string must parse and mean the same thing when fed
# to df.filter(sql_text) — Spark string literals treat backslash as an
# escape char (unlike ANSI), and Spark's LIKE already defaults its escape
# char to backslash, so an appended ESCAPE '\' clause would both fail to
# parse and be redundant. This leg executes the generated text.
@given(rows=ROWS, dnf=DNF)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_spark_sql_text_matches_python(spark, rows, dnf):
    ndnf = normalize_filters(dnf)
    expected = py_eval(rows, ndnf)
    df = spark.createDataFrame(
        [(i, r[0], r[1]) for i, r in enumerate(rows)], ["i", "a", "s"]
    )
    pred = filters_to_sql_predicate(ndnf, SPARK)
    got = {r.i for r in df.filter(pred).select("i").collect()}
    assert got == expected


@pytest.mark.parametrize(
    "value",
    ["50%", "a_b", "it's", "back\\slash", "%_", "100%_done", "end\\", "\\'"],
)
def test_contains_metacharacters_spark_sql(spark, value):
    rows = [(0, value), (1, "no match here"), (2, f"prefix {value} suffix")]
    dnf = normalize_filters([Filter("s", "contains", value)])
    df = spark.createDataFrame(rows, ["i", "s"])
    pred = filters_to_sql_predicate(dnf, SPARK)
    got = {r.i for r in df.filter(pred).select("i").collect()}
    assert got == {0, 2}


@pytest.mark.parametrize(
    "value",
    ["50%", "a_b", "it's", "back\\slash", "%_", "100%_done"],
)
def test_contains_metacharacters_duckdb(value):
    rows = [(0, value), (1, "no match here"), (2, f"prefix {value} suffix")]
    dnf = normalize_filters([Filter("s", "contains", value)])
    pdf = pd.DataFrame(
        {"i": [r[0] for r in rows], "s": [r[1] for r in rows]}
    )
    pred = filters_to_sql_predicate(dnf, DUCKDB)
    con = duckdb.connect()
    con.register("t", pdf)
    got = {
        r[0] for r in con.execute(f"SELECT i FROM t WHERE {pred}").fetchall()
    }
    con.close()
    assert got == {0, 2}
