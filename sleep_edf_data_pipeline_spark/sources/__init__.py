"""Sources: EDF files, seed generator, schema-enforced parquet."""
