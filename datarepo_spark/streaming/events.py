"""Structured Streaming over the events stream.

The reference has no streaming operators (SURVEY.md §2B: tables only) —
this module is the Spark-native extension: the same time-window aggregations
the batch path runs (registry: events_tumbling_window) expressed as an
incremental streaming query with watermarked state, so the engine covers
both the backfill (batch over parquet) and the live path (readStream) with
one set of semantics.

Design:
  - Event time = ``ts``; watermark bounds state: windows older than
    (max event time - watermark) are finalized and their state dropped —
    this is what makes a 100 TB/day stream's state finite.
  - Tumbling/sliding via ``F.window``; sessions via ``F.session_window``
    (gap-merged, stateful).
  - Sums accumulate in DECIMAL(38,6) like the batch registry, so a
    streaming backfill bit-matches the batch result.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core.readconf import apply_parquet_read_compat

# Logical schema of the events stream (streaming file sources require an
# explicit schema — no inference at plan time). ``ts`` is a proper
# timestamp here; read_events_stream adapts to files that physically store
# it as an INT64 nanosecond count (the nanosAsLong legacy layout).
EVENTS_FILE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

_NANOS_SCHEMA = T.StructType(
    [
        f if f.name != "ts" else T.StructField("ts", T.LongType())
        for f in EVENTS_FILE_SCHEMA.fields
    ]
)


def _ts_stored_as_long(path: str) -> bool:
    """Probe one parquet footer under ``path``: True if ``ts`` is a raw
    INT64 nanosecond column (pre-Spark-4 nanos layout) rather than a
    parquet TIMESTAMP. Driver-side, one footer, no data read."""
    try:
        import pyarrow.dataset as ds

        frag = next(iter(ds.dataset(path, format="parquet").get_fragments()))
        import pyarrow as pa

        field = frag.physical_schema.field("ts")
        return pa.types.is_integer(field.type)
    except Exception:
        return False


def read_events_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """File-source stream of events (directory of parquet files). In
    production the source would be Kafka/Kinesis; the transformation DAG
    below is identical either way."""
    apply_parquet_read_compat(spark)
    nanos = _ts_stored_as_long(path)
    reader = spark.readStream.schema(
        _NANOS_SCHEMA if nanos else EVENTS_FILE_SCHEMA
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(path)
    if nanos:
        stream = stream.withColumn(
            "ts", F.expr("timestamp_micros(ts DIV 1000)")
        )
    return stream


def _dsum(col: str):
    return F.sum(F.col(col).cast(T.DecimalType(38, 6))).cast("double")


def windowed_aggregation(
    events: DataFrame,
    window: str = "1 hour",
    slide: Optional[str] = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling (or sliding, if ``slide``) window counts + value sums per
    event_type, with watermarked state eviction."""
    win = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum("value").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_aggregation(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user: gap-merged stateful sessionization — the
    streaming twin of the batch lag/cumsum sessionize in the registry."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            "user_id",
            "n_events",
        )
    )


def run_stream_to_memory(
    result: DataFrame,
    query_name: str,
    output_mode: str = "complete",
) -> DataFrame:
    """Drive a (bounded) file stream to completion into a memory sink and
    return the result table. Test/backfill harness — production would
    writeStream to Delta/Kafka with a real trigger."""
    query = (
        result.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    return result.sparkSession.table(query_name)
