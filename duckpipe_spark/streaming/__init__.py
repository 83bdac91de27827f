from duckpipe_spark.streaming.corpus import (
    incremental_dedup_stateful,
    read_document_stream,
)
from duckpipe_spark.streaming.cdc import apply_cdc_batch, apply_cdc_stream, latest_per_key
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
    "apply_cdc_stream",
    "apply_cdc_batch",
    "latest_per_key",
    "incremental_dedup_stateful",
    "read_document_stream",
]
