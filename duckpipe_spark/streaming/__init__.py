from duckpipe_spark.streaming.events import (
    dedup_event_stream,
    enrich_with_dimension,
    join_click_purchase_streams,
    read_event_stream,
    running_totals_stateful,
    sessionize_stateful,
    session_windows,
    windowed_rollup,
)

__all__ = [
    "read_event_stream",
    "enrich_with_dimension",
    "join_click_purchase_streams",
    "windowed_rollup",
    "session_windows",
    "sessionize_stateful",
    "running_totals_stateful",
    "dedup_event_stream",
]
