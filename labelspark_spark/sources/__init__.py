from labelspark_spark.sources.readers import (
    TPCH_TABLES,
    json_literal_to_df,
    parquet_stats,
    read_csv,
    read_delta,
    read_json_files,
    read_parquet,
    read_table,
    register_tables,
)
from labelspark_spark.sources.writers import (
    register_view,
    rest_sink,
    write_delta,
    write_parquet,
)

__all__ = [
    "TPCH_TABLES",
    "json_literal_to_df",
    "parquet_stats",
    "read_csv",
    "read_delta",
    "read_json_files",
    "read_parquet",
    "read_table",
    "register_tables",
    "register_view",
    "rest_sink",
    "write_delta",
    "write_parquet",
]
