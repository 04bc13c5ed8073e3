from .pipeline import (  # noqa: F401
    dedup_first_seen_stream,
    dedup_native_stream,
    dedup_watermarked_stream,
    events_stream_from_files,
    incremental_counts_to_store,
    incremental_dedup_to_store,
    read_count_store,
    sessionize_stream,
    sliding_counts_stream,
    tumbling_counts_stream,
)
