"""Corpus export/import: size-bounded JSONL shards.

Training corpora ship as JSONL shards (one JSON document per line,
bounded records per file so downstream loaders can parallelize and
retry per-shard).  Spark's writer handles the sharding natively:
``maxRecordsPerFile`` bounds each output file and the task-level
parallelism decides shard fan-out — no driver-side loop, no collect.

Reading back goes through an explicit schema: schema inference on
100 TB of JSONL is a full extra scan, and silent type widening
(ints→doubles) breaks round-trip parity.  ``read_jsonl`` therefore
requires the schema (or takes it from a reference DataFrame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def export_jsonl_shards(
    df: DataFrame,
    path: str,
    max_records_per_file: int = 10_000,
    compression: str | None = None,
) -> None:
    """Write ``df`` as JSONL shards of at most ``max_records_per_file``.

    Shard count = Σ over tasks of ceil(task_rows / max); repartition
    upstream if a specific shard layout is needed.
    """
    writer = df.write.mode("overwrite").option(
        "maxRecordsPerFile", max_records_per_file
    )
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
) -> DataFrame:
    """Schema-pinned JSONL scan (no inference pass)."""
    return spark.read.schema(schema).json(path)
