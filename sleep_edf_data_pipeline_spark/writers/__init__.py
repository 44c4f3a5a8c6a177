"""Sinks: partitioned parquet with atomic per-entity overwrite, error log."""
