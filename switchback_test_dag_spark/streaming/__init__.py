from switchback_test_dag_spark.streaming.windows import (
    run_stream_to_memory,
    session_window_sessions,
    stream_dedup,
    stream_events,
    stream_jsonl_events,
    windowed_bucket_metrics,
)

__all__ = [
    "run_stream_to_memory",
    "session_window_sessions",
    "stream_dedup",
    "stream_events",
    "stream_jsonl_events",
    "windowed_bucket_metrics",
]
