"""Input connectors: batch/streaming JSON CDC logs, parquet, binary files."""
