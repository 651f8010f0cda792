from .windows import (
    run_stateful_user_counts,
    run_stream_stream_join,
    run_stream_stream_full_outer_join,
    run_stream_stream_left_outer_join,
    run_tumbling_stream,
    sliding_window_agg,
    streaming_events,
)

__all__ = [
    "run_stateful_user_counts",
    "run_stream_stream_join",
    "run_stream_stream_full_outer_join",
    "run_stream_stream_left_outer_join",
    "run_tumbling_stream",
    "sliding_window_agg",
    "streaming_events",
]
