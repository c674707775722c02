from .events import (  # noqa: F401
    read_events_stream,
    windowed_counts,
    session_aggregates,
    run_stream_to_table,
)
