from .windowed import tumbling_event_counts, tumbling_event_counts_stream  # noqa: F401
