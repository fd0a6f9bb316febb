"""Source/sink connectors beyond the parquet fixtures."""
