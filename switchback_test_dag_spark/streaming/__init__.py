from switchback_test_dag_spark.streaming.windows import (
    run_stream_to_memory,
    stream_dedup,
    stream_events,
    windowed_bucket_metrics,
)

__all__ = [
    "run_stream_to_memory",
    "stream_dedup",
    "stream_events",
    "windowed_bucket_metrics",
]
