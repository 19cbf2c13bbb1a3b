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


def _ts_stored_as_long(path: str) -> Optional[bool]:
    """Probe one parquet footer under ``path``: True if ``ts`` is a raw
    INT64 nanosecond column (pre-Spark-4 nanos layout) rather than a
    parquet TIMESTAMP; None when the layout cannot be determined (no
    files yet — the normal cold start of a file-source stream — or no
    pyarrow). Driver-side, one footer, no data read."""
    try:
        import pyarrow as pa
        import pyarrow.dataset as ds
    except Exception:
        return None
    try:
        fragments = iter(ds.dataset(path, format="parquet").get_fragments())
        frag = next(fragments, None)
        if frag is None:
            return None  # empty directory: nothing to probe
        field = frag.physical_schema.field("ts")
        # raw INT64 nanos, or a TIMESTAMP(NANOS) annotation — under the
        # engine's nanosAsLong read conf Spark surfaces BOTH as LongType,
        # so both need the long schema + micros conversion
        if pa.types.is_timestamp(field.type):
            return field.type.unit == "ns"
        return bool(pa.types.is_integer(field.type))
    except Exception:
        return None


def read_events_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: Optional[int] = None,
    nanos: Optional[bool] = None,
) -> DataFrame:
    """File-source stream of events (directory of parquet files). In
    production the source would be Kafka/Kinesis; the transformation DAG
    below is identical either way.

    ``nanos``: the physical layout of ``ts`` — True for the pre-Spark-4
    INT64-nanos layout, False for a true parquet TIMESTAMP. A streaming
    schema is fixed at PLAN time, before most files exist, so when the
    directory is cold the probe cannot decide for you: pass it
    explicitly if the first files will be nanos-layout. Default: probe
    an existing footer; if none, assume TIMESTAMP and warn, so a
    later-arriving nanos file fails with a schema error that names this
    parameter rather than a bare parquet conversion error."""
    apply_parquet_read_compat(spark)
    if nanos is None:
        probed = _ts_stored_as_long(path)
        if probed is None:
            import logging

            logging.getLogger(__name__).warning(
                "read_events_stream(%s): no parquet footer to probe "
                "(cold directory?); assuming ts is a true TIMESTAMP. "
                "Pass nanos=True if the stream's files store INT64 "
                "nanoseconds.", path,
            )
        nanos = bool(probed)
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


def first_event_per_key(
    stream: DataFrame,
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming first-arrival record per key: MIN over the
    (ts, event_id, value) struct — the admission-dedup primitive ("keep
    the first version of every key ever seen"). A struct MIN is
    commutative/associative state, so the final answer is independent
    of micro-batch slicing AND of row order inside a batch — unlike
    streaming ``dropDuplicates``, which keeps an *arbitrary* row when a
    key repeats within one batch. State is one struct per key, bounded
    by key cardinality."""
    return (
        stream.groupBy(key_col)
        .agg(F.min(F.struct("ts", "event_id", "value")).alias("first"))
        .select(
            key_col,
            F.col("first.ts").alias("first_ts"),
            F.col("first.event_id").alias("first_event_id"),
            F.col("first.value").alias("first_value"),
        )
    )
