from .io import (
    read_csv,
    read_json,
    read_parquet,
    write_parquet,
    write_partitioned_parquet,
)
