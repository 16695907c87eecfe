from fineo_readerator_spark.streaming.streams import (
    build_metric_stream,
    dedup_stream,
    interval_join_streams,
    maintain_signature_store,
    read_metric_stream,
    read_source_stream,
    run_available_now,
    sessionize,
    stateful_running_totals,
    windowed_rollup,
    write_stream_parquet,
)

__all__ = [
    "build_metric_stream",
    "dedup_stream",
    "interval_join_streams",
    "maintain_signature_store",
    "read_metric_stream",
    "read_source_stream",
    "run_available_now",
    "sessionize",
    "stateful_running_totals",
    "windowed_rollup",
    "write_stream_parquet",
]
