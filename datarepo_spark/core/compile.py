"""Compile the DNF filter IR to ``pyspark.sql.Column`` trees.

This is the Spark analogue of the reference's polars-expression compiler
(reference parquet_table.py:32-149: _filter_to_expr / pl_all / pl_any).
Because the output is a plain Catalyst expression tree, predicate pushdown,
partition pruning, and parquet row-group skipping all come for free — no
custom optimizer rules are needed (SURVEY.md §4).
"""

from __future__ import annotations

from functools import reduce
from operator import and_, or_
from typing import Any, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

from .filters import Filter, NormalizedFilters


def filter_to_column(f: Filter) -> Column:
    """One ``Filter`` → one boolean ``Column``."""
    col = F.col(f.column)
    op = f.operator
    if op == "=":
        return col == F.lit(f.value)
    if op == "!=":
        return col != F.lit(f.value)
    if op == "<":
        return col < F.lit(f.value)
    if op == "<=":
        return col <= F.lit(f.value)
    if op == ">":
        return col > F.lit(f.value)
    if op == ">=":
        return col >= F.lit(f.value)
    if op == "in":
        return col.isin(list(f.value))
    if op == "not in":
        return ~col.isin(list(f.value))
    if op == "contains":
        return col.contains(f.value)
    if op == "includes":
        return F.array_contains(col, F.lit(f.value))
    if op == "includes any":
        return _fold_or([F.array_contains(col, F.lit(v)) for v in f.value])
    if op == "includes all":
        return _fold_and([F.array_contains(col, F.lit(v)) for v in f.value])
    raise ValueError(f"Unsupported filter operator: {op!r}")


def _fold_and(cols: list[Column]) -> Column:
    if not cols:
        return F.lit(True)
    return reduce(and_, cols)


def _fold_or(cols: list[Column]) -> Column:
    if not cols:
        return F.lit(False)
    return reduce(or_, cols)


def conjunction_to_column(conj: list[Filter]) -> Column:
    """AND-fold one conjunction."""
    return _fold_and([filter_to_column(f) for f in conj])


def filters_to_column(filters: NormalizedFilters) -> Optional[Column]:
    """DNF → one boolean Column (OR of AND-folds); ``None`` if no filters.

    Mirrors reference _filters_to_expr (parquet_table.py:128-149): an empty
    DNF means "no predicate", not FALSE.
    """
    if not filters:
        return None
    return _fold_or([conjunction_to_column(c) for c in filters])
