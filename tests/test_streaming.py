"""Streaming/batch differential: the windowed bucket aggregation must produce
identical results through the micro-batch path and the batch path."""

from __future__ import annotations

import os

from switchback_test_dag_spark.io import load_table
from switchback_test_dag_spark.streaming import (
    run_stream_to_memory,
    stream_events,
    windowed_bucket_metrics,
)


def _sorted_rows(df):
    return sorted(
        tuple(row) for row in df.collect()
    )


def test_streaming_matches_batch(spark, sf_dir, tmp_path):
    path = os.path.join(sf_dir, "events.parquet")

    stream = stream_events(spark, path)
    assert stream.isStreaming
    streamed = windowed_bucket_metrics(stream, window="1 hour", watermark="2 hours")
    run_stream_to_memory(streamed, "bucket_metrics_test", str(tmp_path))
    got = _sorted_rows(spark.table("bucket_metrics_test"))

    batch = windowed_bucket_metrics(load_table(spark, sf_dir, "events"), window="1 hour")
    expected = _sorted_rows(batch)

    assert len(got) > 0
    assert got == expected


def test_streaming_multiple_microbatches(spark, sf_dir, tmp_path):
    """maxFilesPerTrigger=1 still converges to the same full answer."""
    path = os.path.join(sf_dir, "events.parquet")
    stream = stream_events(spark, path, max_files_per_trigger=1)
    streamed = windowed_bucket_metrics(stream, window="4 hours", watermark="1 hour")
    run_stream_to_memory(streamed, "bucket_metrics_mb", str(tmp_path))
    got = _sorted_rows(spark.table("bucket_metrics_mb"))
    expected = _sorted_rows(
        windowed_bucket_metrics(load_table(spark, sf_dir, "events"), window="4 hours")
    )
    assert got == expected
