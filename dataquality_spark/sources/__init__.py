"""Table IO — Iceberg when available, partitioned Parquet fallback."""
