"""datarepo_spark — a PySpark-native declarative data catalog + query engine.

Capability parity with neuralinkcorp/datarepo (catalog, filter algebra,
partition-pruned parquet/Delta/JDBC sources, exports), re-expressed
Spark-first: every table call returns a lazy ``pyspark.sql.DataFrame`` and
Catalyst/Tungsten provide optimization + distributed execution. Extensions
for LLM-scale data pipelines live in :mod:`datarepo_spark.functions`.
"""

from .catalog.catalog import (
    Catalog,
    Database,
    DatabaseWithGlobalArgs,
    DictDatabase,
    ModuleDatabase,
)
from .core.filters import Filter, FilterOperator, normalize_filters
from .session import get_spark
from .tables.delta_table import DeltalakeTable
from .tables.file_table import FileTable
from .tables.function_table import FunctionTable, table
from .tables.jdbc_table import ClickHouseTable, JdbcConfig, JdbcTable
from .tables.metadata import (
    Partition,
    PartitioningScheme,
    TableColumn,
    TableMetadata,
    TablePartition,
    TableSchema,
)
from .tables.bucketed import BucketedTable, write_bucketed
from .tables.delta_cdf import DeltaChangeStream, table_changes
from .tables.ivm import IncrementalAggregate
from .tables.delta_writer import (
    ConcurrentModificationError,
    ConstraintViolationError,
    add_check_constraint,
    drop_check_constraint,
    compact,
    convert_to_delta,
    delete_delta,
    describe_history,
    merge_delta,
    restore_table,
    update_delta,
    vacuum,
    write_delta,
    zorder_by,
)
from .tables.parquet_table import ParquetTable

__all__ = [
    "BucketedTable",
    "ConcurrentModificationError",
    "ConstraintViolationError",
    "add_check_constraint",
    "drop_check_constraint",
    "DeltaChangeStream",
    "IncrementalAggregate",
    "convert_to_delta",
    "delete_delta",
    "describe_history",
    "restore_table",
    "table_changes",
    "update_delta",
    "Catalog",
    "ClickHouseTable",
    "Database",
    "DatabaseWithGlobalArgs",
    "DeltalakeTable",
    "DictDatabase",
    "FileTable",
    "Filter",
    "FilterOperator",
    "FunctionTable",
    "JdbcConfig",
    "JdbcTable",
    "ModuleDatabase",
    "ParquetTable",
    "Partition",
    "PartitioningScheme",
    "TableColumn",
    "TableMetadata",
    "TablePartition",
    "TableSchema",
    "compact",
    "merge_delta",
    "get_spark",
    "normalize_filters",
    "table",
    "vacuum",
    "write_bucketed",
    "write_delta",
    "zorder_by",
]

__version__ = "0.1.0"
