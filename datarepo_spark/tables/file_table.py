"""Generic file-format tables: CSV / JSON-lines / ORC / text.

The reference catalogs parquet, Delta, and ClickHouse sources; real
corpora also arrive as CSV dumps, JSONL crawls, and ORC exports. One
table class covers them with the SAME call surface as ParquetTable
(DNF ``filters=``, ``columns=``, lazy DataFrame out), so a catalog can
mix formats transparently. Spark's DataSource V2 handles the scan;
filters compile to Catalyst Columns and push into the source where the
format supports it (ORC: full pushdown; CSV/JSON: Spark prunes columns
at parse time — at 100 TB that means a projected CSV scan tokenizes
only the needed fields).

A declared ``schema`` is strongly recommended for CSV/JSON at scale:
schema inference reads the data TWICE (once to infer, once to scan) —
fine locally, a disaster on a 100 TB crawl.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..core.compile import filters_to_column
from ..core.readconf import apply_parquet_read_compat
from ..core.filters import (
    InputFilters,
    normalize_filters,
    validate_filters,
)
from .metadata import TableColumn, TableMetadata, TableSchema, TableType

_FORMATS = {"csv", "json", "orc", "text"}

_DEFAULT_OPTIONS: dict[str, dict[str, str]] = {
    "csv": {"header": "true"},
    "json": {},
    "orc": {},
    "text": {},
}


class FileTable:
    """A lazily-scanned CSV/JSON/ORC/text table with the DNF filter
    surface."""

    def __init__(
        self,
        name: str,
        uri: str | Sequence[str],
        file_format: str = "csv",
        schema: Optional[T.StructType] = None,
        options: Optional[dict[str, str]] = None,
        description: str = "",
        table_metadata: Optional[TableMetadata] = None,
    ) -> None:
        if file_format not in _FORMATS:
            raise ValueError(
                f"file_format must be one of {sorted(_FORMATS)}, "
                f"got {file_format!r}"
            )
        self.name = name
        self.uris = [uri] if isinstance(uri, str) else list(uri)
        self.uri = self.uris[0]
        self.file_format = file_format
        self.schema = schema
        self.options = {**_DEFAULT_OPTIONS[file_format], **(options or {})}
        self.table_metadata = table_metadata or TableMetadata(
            table_type=TableType.PARQUET.value,
            description=description or f"{file_format} table at {self.uri}",
        )

    def _reader(self, spark: SparkSession):
        reader = spark.read.format(self.file_format).options(**self.options)
        if self.schema is not None:
            reader = reader.schema(self.schema)
        return reader

    def __call__(
        self,
        filters: InputFilters = None,
        columns: Optional[Sequence[str]] = None,
        spark: Optional[SparkSession] = None,
        **kwargs: Any,
    ) -> DataFrame:
        session = spark or SparkSession.getActiveSession()
        if session is None:
            raise RuntimeError("no active SparkSession")
        apply_parquet_read_compat(session)
        df = self._reader(session).load(self.uris)
        dnf = normalize_filters(filters)
        validate_filters(dnf, df.columns)
        predicate = filters_to_column(dnf)
        if predicate is not None:
            df = df.filter(predicate)
        if columns is not None:
            unknown = set(columns) - set(df.columns)
            if unknown:
                raise ValueError(f"Unknown columns: {sorted(unknown)}")
            df = df.select(*columns)
        return df

    def get_schema(
        self, spark: Optional[SparkSession] = None
    ) -> TableSchema:
        if self.schema is not None:
            fields = self.schema.fields
        else:
            session = spark or SparkSession.getActiveSession()
            if session is None:
                raise RuntimeError("no schema declared and no session")
            fields = self._reader(session).load(self.uris).schema.fields
        return TableSchema(
            columns=[
                TableColumn(
                    column=f.name,
                    type=f.dataType.simpleString(),
                    readonly=False,
                    filter_only=False,
                )
                for f in fields
            ],
            partitions=[],
        )
