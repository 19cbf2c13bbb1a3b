"""Structured Streaming tests: a bounded file stream driven through
watermarked windowed aggregation must reproduce the batch result exactly
(same decimal accumulation), across multiple micro-batches."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from datarepo_spark.queries.registry import REGISTRY
from datarepo_spark.streaming import events as SE


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory, sf_dir):
    # Split the single events parquet into several files so the stream
    # runs as multiple micro-batches (maxFilesPerTrigger=1).
    import pyarrow.parquet as pq

    out = tmp_path_factory.mktemp("events_stream")
    table = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    n = 4
    step = (table.num_rows + n - 1) // n
    for i in range(n):
        chunk = table.slice(i * step, step)
        if chunk.num_rows:
            pq.write_table(chunk, str(out / f"part-{i}.parquet"))
    yield str(out)
    shutil.rmtree(str(out), ignore_errors=True)


class TestStreamingWindows:
    def test_tumbling_matches_batch(self, spark, events_dir, sf_dir):
        stream = SE.read_events_stream(spark, events_dir, max_files_per_trigger=1)
        result = SE.windowed_aggregation(stream, window="1 hour")
        got = SE.run_stream_to_memory(result, "stream_tumbling")
        batch = REGISTRY["events_tumbling_window"].spark_fn(spark, sf_dir)
        g = {
            (r.window_start, r.event_type): (r.n_events, r.total_value)
            for r in got.collect()
        }
        b = {
            (r.window_start, r.event_type): (r.n_events, r.total_value)
            for r in batch.collect()
        }
        assert g == b  # incremental state == batch, bit-exact

    def test_sliding_window(self, spark, events_dir):
        stream = SE.read_events_stream(spark, events_dir)
        result = SE.windowed_aggregation(
            stream, window="2 hours", slide="1 hour"
        )
        got = SE.run_stream_to_memory(result, "stream_sliding")
        rows = got.collect()
        assert len(rows) > 0
        # every event lands in exactly 2 sliding windows → total doubles
        total_sliding = sum(r.n_events for r in rows)
        batch_total = (
            spark.read.parquet(events_dir).count()
        )
        assert total_sliding == 2 * batch_total

    def test_session_aggregation(self, spark, events_dir):
        stream = SE.read_events_stream(spark, events_dir)
        result = SE.session_aggregation(stream, gap="30 minutes")
        got = SE.run_stream_to_memory(result, "stream_sessions")
        rows = got.collect()
        assert len(rows) > 0
        n_events = sum(r.n_events for r in rows)
        assert n_events == spark.read.parquet(events_dir).count()

    def test_is_actually_streaming(self, spark, events_dir):
        stream = SE.read_events_stream(spark, events_dir)
        assert stream.isStreaming
        result = SE.windowed_aggregation(stream)
        assert result.isStreaming
