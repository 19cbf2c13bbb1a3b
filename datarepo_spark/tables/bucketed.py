"""Bucketed tables: pre-shuffled storage for co-located, exchange-free joins.

The reference has no bucketing concept (its Polars/DataFusion execution is
single-node, so "co-location" is moot — SURVEY.md §4). On a cluster it is the
single highest-leverage layout decision for a 100 TB fact table: a join or
aggregation keyed on the bucket columns needs NO shuffle at all, because the
data was hash-partitioned once at write time and Spark's scan reports that
`HashPartitioning(bucket_cols, n)` output partitioning to Catalyst, which
then elides the Exchange on that side (both sides, if both tables share the
bucket spec). At 100 TB, that converts every repeated lineitem⋈orders from a
full-data shuffle into a purely local zip of bucket files.

Mechanics (Spark-native, no custom code path):
  - write: ``df.write.bucketBy(n, cols).sortBy(cols).saveAsTable(name)`` —
    bucketing metadata lives in the session catalog (or a Hive metastore in
    production), files are laid out one-or-more per (partition, bucket).
  - read: ``spark.table(name)`` — a path-based ``spark.read.parquet`` does
    NOT see bucket metadata; the catalog read is what makes the scan report
    its output partitioning.
  - ``sortBy`` additionally lets SortMergeJoin skip its per-partition sort
    when join keys == sort keys.

Sizing rule of thumb at the 100 TB design point: pick ``num_buckets`` so a
single bucket's compressed footprint is 100-500 MB (e.g. 100 TB / 256 MB ≈
400k — in practice combine with date partitioning so each partition's
buckets stay in the low thousands and small-file pressure stays bounded).
Both join sides must share (cols, num_buckets) for a shuffle-free plan.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from ..core.compile import filters_to_column
from ..core.filters import (
    InputFilters,
    normalize_filters,
    validate_filters,
)
from .metadata import TableColumn, TableMetadata, TableSchema, TableType


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Optional[Sequence[str]] = None,
    partition_cols: Optional[Sequence[str]] = None,
    path: Optional[str] = None,
    mode: str = "overwrite",
    file_format: str = "parquet",
) -> None:
    """Write ``df`` as a bucketed catalog table.

    ``sort_cols`` defaults to ``bucket_cols`` (sorted buckets let SMJ skip
    its sort). ``path`` makes it an external table (data survives catalog
    drop); otherwise files land under ``spark.sql.warehouse.dir``.
    """
    writer = df.write.format(file_format).mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer = writer.bucketBy(num_buckets, *bucket_cols)
    sort = list(sort_cols) if sort_cols is not None else list(bucket_cols)
    if sort:
        writer = writer.sortBy(*sort)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


class BucketedTable:
    """Table-protocol wrapper over a bucketed catalog table.

    Same call surface as ParquetTable (`filters=` DNF, `columns=`), but the
    scan goes through ``spark.table`` so Catalyst sees the bucket spec and
    can plan exchange-free joins/aggregations on ``bucket_cols``.
    """

    def __init__(
        self,
        name: str,
        table_name: str,
        bucket_cols: Sequence[str],
        num_buckets: int,
        description: str = "",
        table_metadata: Optional[TableMetadata] = None,
    ) -> None:
        self.name = name
        self.table_name = table_name
        self.bucket_cols = list(bucket_cols)
        self.num_buckets = num_buckets
        self.table_metadata = table_metadata or TableMetadata(
            table_type=TableType.PARQUET.value,
            description=description
            or (
                f"bucketed({num_buckets} x {', '.join(self.bucket_cols)}) "
                f"catalog table {table_name}"
            ),
        )

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
        df = session.table(self.table_name)
        dnf = normalize_filters(filters)
        validate_filters(dnf, df.columns)
        predicate = filters_to_column(dnf)
        if predicate is not None:
            df = df.filter(predicate)
        if columns is not None:
            df = df.select(*columns)
        return df

    def get_schema(
        self, spark: Optional[SparkSession] = None
    ) -> TableSchema:
        df = self(spark=spark)
        return TableSchema(
            columns=[
                TableColumn(column=f.name, type=f.dataType.simpleString())
                for f in df.schema.fields
            ],
            partitions=[],
        )
