from .events import (
    click_purchase_join_stream,
    hourly_rollup_stream,
    run_stream_to_memory,
    session_window_stream,
    stream_events,
    user_running_totals_stream,
)

__all__ = [
    "stream_events",
    "click_purchase_join_stream",
    "hourly_rollup_stream",
    "session_window_stream",
    "user_running_totals_stream",
    "run_stream_to_memory",
]
