"""Table metadata & introspection types.

Parity: reference src/datarepo/core/tables/metadata.py:8-56 (TableMetadata,
TableSchema/TablePartition/TableColumn, TableProtocol) and util.py:29-43
(Partition, PartitioningScheme). These are documentation/introspection
structures — they never affect query execution.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Optional, Protocol, runtime_checkable

from pyspark.sql import DataFrame


class TableType(str, Enum):
    PARQUET = "parquet"
    DELTA = "delta"
    JDBC = "jdbc"
    CLICKHOUSE = "clickhouse"
    FUNCTION = "function"


@dataclass
class TableMetadata:
    """Docs-only descriptor attached to every table (reference
    metadata.py:8-21)."""

    table_type: str = TableType.FUNCTION.value
    description: str = ""
    docs_args: dict[str, Any] = field(default_factory=dict)
    latency_info: Optional[str] = None
    example_notebook: Optional[str] = None
    data_input: Optional[str] = None
    is_deprecated: bool = False
    roapi_opts: Optional[Any] = None


@dataclass
class TableColumn:
    column: str
    type: str
    readonly: bool = False
    filter_only: bool = False
    has_stats: bool = False


@dataclass
class TablePartition:
    column_name: str
    type_annotation: str
    value: Optional[Any] = None


@dataclass
class TableSchema:
    columns: list[TableColumn] = field(default_factory=list)
    partitions: list[TablePartition] = field(default_factory=list)


class PartitioningScheme(Enum):
    """Physical path layout for partitioned parquet (reference util.py:29-38).

    DIRECTORY: ``<uri>/5956/2024-03-24/part.parquet`` (bare values)
    HIVE:      ``<uri>/implant_id=5956/date=2024-03-24/part.parquet``
    """

    DIRECTORY = "directory"
    HIVE = "hive"


@dataclass(frozen=True)
class Partition:
    """A declared physical partition column (reference util.py:41-43).

    ``col_type`` is a Spark DataType (e.g. ``T.IntegerType()``).
    """

    column: str
    col_type: Any


@runtime_checkable
class TableProtocol(Protocol):
    """Anything callable returning a Spark DataFrame, carrying metadata
    (reference metadata.py:46-56)."""

    table_metadata: TableMetadata

    def __call__(self, *args: Any, **kwargs: Any) -> DataFrame: ...

    def get_schema(self) -> TableSchema: ...
