from .ops import (
    read_stream_parquet,
    sessionize,
    streaming_dedup,
    streaming_near_dedup,
    windowed_counts,
    write_stream_memory,
)
