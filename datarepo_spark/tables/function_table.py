"""Function tables: any Python function returning a DataFrame is a table.

Parity: reference ``@table`` decorator (decorator.py:16-117). Semantics kept:
  - kwargs are filtered down to the wrapped function's signature
    (decorator.py:35-47) so catalog-level global args don't explode calls;
  - the wrapper carries ``table_metadata`` and ``get_schema()``;
  - schema introspection runs the function with its docs args and reads
    ``df.schema`` (decorator.py:69-79 collects; Spark stays lazy — schema is
    known without executing the plan, a strict improvement).
"""

from __future__ import annotations

import functools
import inspect
from typing import Any, Callable, Optional, Sequence

from pyspark.sql import DataFrame

from ..core.filters import Filter
from .metadata import TableColumn, TableMetadata, TableSchema, TableType


class FunctionTable:
    def __init__(
        self,
        fn: Callable[..., DataFrame],
        table_metadata: TableMetadata,
        docs_args: Optional[dict[str, Any]] = None,
    ) -> None:
        functools.update_wrapper(self, fn)
        self.fn = fn
        self.table_metadata = table_metadata
        self.docs_args = docs_args or {}
        self._signature = inspect.signature(fn)

    def _accepted_kwargs(self, kwargs: dict[str, Any]) -> dict[str, Any]:
        params = self._signature.parameters
        if any(
            p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values()
        ):
            return kwargs
        return {k: v for k, v in kwargs.items() if k in params}

    def __call__(self, *args: Any, **kwargs: Any) -> DataFrame:
        return self.fn(*args, **self._accepted_kwargs(kwargs))

    def get_schema(self) -> TableSchema:
        df = self(**self.docs_args)
        return TableSchema(
            columns=[
                TableColumn(column=f.name, type=f.dataType.simpleString())
                for f in df.schema.fields
            ],
            partitions=[],
        )


def table(
    description: str = "",
    docs_args: Optional[dict[str, Any]] = None,
    latency_info: Optional[str] = None,
    example_notebook: Optional[str] = None,
    data_input: Optional[str] = None,
    is_deprecated: bool = False,
    docs_filters: Sequence[Filter] = (),
) -> Callable[[Callable[..., DataFrame]], FunctionTable]:
    """Decorator turning a DataFrame-returning function into a catalog table."""

    def wrap(fn: Callable[..., DataFrame]) -> FunctionTable:
        meta = TableMetadata(
            table_type=TableType.FUNCTION.value,
            description=description or (fn.__doc__ or "").strip(),
            docs_args=docs_args or {},
            latency_info=latency_info,
            example_notebook=example_notebook,
            data_input=data_input,
            is_deprecated=is_deprecated,
        )
        return FunctionTable(fn, meta, docs_args=docs_args)

    return wrap
