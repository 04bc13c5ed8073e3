from .pipeline import events_stream_from_files, tumbling_counts_stream, sessionize_stream  # noqa: F401
