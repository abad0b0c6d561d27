from .io import (
    layout_for_scan,
    read_binary_files,
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    read_text,
    write_jsonl,
    write_orc,
    write_parquet,
    write_partitioned_parquet,
)
