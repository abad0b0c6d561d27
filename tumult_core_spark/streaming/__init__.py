from .ops import (
    read_stream_parquet,
    sessionize,
    stream_interval_join,
    streaming_dedup,
    streaming_near_dedup,
    windowed_counts,
    write_stream_memory,
)
