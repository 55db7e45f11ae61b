"""Sources and sinks: partitioned Parquet I/O and catalog registration."""
