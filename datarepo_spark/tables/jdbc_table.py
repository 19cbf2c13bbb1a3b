"""JDBC source table with SQL pushdown (ClickHouse-flavoured).

Parity target: reference ClickHouseTable (clickhouse_table.py:50-274):
the whole DNF + projection is compiled to ONE SQL string executed by the
remote server (_build_query :156-239); only the result crosses the wire.

Spark-first: the generated SQL becomes a JDBC *subquery* —
``spark.read.jdbc(url, table="(SELECT …) q")`` — so the server still does
filter+projection, and Spark adds partitioned parallel reads
(partitionColumn/numPartitions) on top, which the reference's single
connectorx channel can't do. The SQL generator is shared with the Delta
path (core/sql.py, CLICKHOUSE dialect).
"""

from __future__ import annotations

import logging
import warnings
from dataclasses import dataclass
from typing import Any, Callable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..core.filters import (
    InputFilters,
    normalize_filters,
    validate_filters,
)
from ..core.sql import CLICKHOUSE, SqlDialect, build_select_query
from .metadata import (
    TableColumn,
    TableMetadata,
    TableSchema,
    TableType,
)
from .parquet_table import _active_spark

logger = logging.getLogger(__name__)


@dataclass
class JdbcConfig:
    url: str  # e.g. jdbc:clickhouse://host:8123/db or jdbc:postgresql://...
    user: Optional[str] = None
    password: Optional[str] = None
    driver: Optional[str] = None
    # Parallel-read knobs: server-side split column (numeric/date) so Spark
    # issues numPartitions range-bounded queries instead of one channel.
    partition_column: Optional[str] = None
    num_partitions: Optional[int] = None
    lower_bound: Optional[Any] = None
    upper_bound: Optional[Any] = None


class JdbcTable:
    """A remote SQL table; every call pushes one generated SELECT down."""

    def __init__(
        self,
        name: str,
        schema: T.StructType,
        config: JdbcConfig,
        database: Optional[str] = None,
        description: str = "",
        dialect: SqlDialect = CLICKHOUSE,
        table_metadata: Optional[TableMetadata] = None,
        reader: Optional[Callable[..., DataFrame]] = None,
    ) -> None:
        self.name = name
        self.schema = schema
        self.config = config
        self.database = database
        self.dialect = dialect
        self.table_metadata = table_metadata or TableMetadata(
            table_type=TableType.CLICKHOUSE.value
            if dialect.name == "clickhouse"
            else TableType.JDBC.value,
            description=description,
        )
        self._reader = reader  # injectable for tests (mock transport)

    # -- SQL generation (pure; golden-testable without a server) ----------

    def build_query(
        self,
        filters: InputFilters = None,
        columns: Optional[Sequence[str]] = None,
    ) -> str:
        dnf = normalize_filters(filters) if not isinstance(filters, str) else []
        known = [f.name for f in self.schema.fields]
        validate_filters(dnf, known)
        if columns:
            unknown = [c for c in columns if c not in known]
            if unknown:
                # Reference warns and drops unknown projection columns
                # (clickhouse_table.py:170-178).
                warnings.warn(
                    f"Ignoring unknown columns {unknown} on {self.name}"
                )
                columns = [c for c in columns if c in known]
        table = (
            f"{self.database}.{self.name}" if self.database else self.name
        )
        query = build_select_query(
            table, columns=columns, filters=dnf, dialect=self.dialect
        )
        if isinstance(filters, str):
            query += f" WHERE {filters}"
        return query

    # -- read ---------------------------------------------------------------

    def __call__(
        self,
        filters: InputFilters = None,
        columns: Optional[Sequence[str]] = None,
        spark: Optional[SparkSession] = None,
        **kwargs: Any,
    ) -> DataFrame:
        query = self.build_query(filters, columns)
        if self._reader is not None:
            return self._reader(query=query, config=self.config)
        session = _active_spark(spark)
        reader = (
            session.read.format("jdbc")
            .option("url", self.config.url)
            .option("dbtable", f"({query}) q")
        )
        if self.config.user:
            reader = reader.option("user", self.config.user)
        if self.config.password:
            reader = reader.option("password", self.config.password)
        if self.config.driver:
            reader = reader.option("driver", self.config.driver)
        if self.config.partition_column:
            reader = (
                reader.option("partitionColumn", self.config.partition_column)
                .option("numPartitions", str(self.config.num_partitions or 8))
                .option("lowerBound", str(self.config.lower_bound))
                .option("upperBound", str(self.config.upper_bound))
            )
        return reader.load()

    def get_schema(self, spark: Optional[SparkSession] = None) -> TableSchema:
        return TableSchema(
            columns=[
                TableColumn(column=f.name, type=f.dataType.simpleString())
                for f in self.schema.fields
            ],
            partitions=[],
        )


# Compatibility alias matching the reference's naming.
ClickHouseTable = JdbcTable
