from .windows import run_tumbling_stream, sliding_window_agg, streaming_events

__all__ = ["run_tumbling_stream", "sliding_window_agg", "streaming_events"]
