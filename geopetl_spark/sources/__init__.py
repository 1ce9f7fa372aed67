from .cdc_gen import CDC_COLUMNS, generate_cdc_events, write_cdc_log
from .readers import from_csv, from_json, from_parquet, from_table
from .registry import parse_source_url, read_source, write_sink
from .jdbc import compile_jdbc_options, compile_jdbc_write_options, from_jdbc, to_jdbc

__all__ = [
    "CDC_COLUMNS", "generate_cdc_events", "write_cdc_log",
    "from_csv", "from_json", "from_parquet", "from_table",
    "parse_source_url", "read_source", "write_sink",
    "compile_jdbc_options", "compile_jdbc_write_options", "from_jdbc", "to_jdbc",
]
