from .events import (
    attribution_stream,
    click_purchase_join_stream,
    doc_dedup_stream,
    funnel_stage_stream,
    hopping_rollup_stream,
    hourly_rollup_stream,
    run_stream_to_memory,
    session_window_stream,
    stream_documents,
    stream_events,
    transitions_stream,
    user_running_totals_stream,
)

__all__ = [
    "attribution_stream",
    "stream_events",
    "stream_documents",
    "click_purchase_join_stream",
    "doc_dedup_stream",
    "funnel_stage_stream",
    "hopping_rollup_stream",
    "hourly_rollup_stream",
    "session_window_stream",
    "user_running_totals_stream",
    "run_stream_to_memory",
    "transitions_stream",
]
