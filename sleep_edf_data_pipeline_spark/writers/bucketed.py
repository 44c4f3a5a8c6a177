"""Bucketed warehouse tables: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a fact-fact join is shuffling both sides
on the key.  Bucketing pays that shuffle ONCE at write time: each table
is hash-partitioned into a fixed number of buckets on the join key (and
optionally sorted within buckets), so every future join or aggregation
on that key reads aligned buckets and plans with **zero exchanges** —
tests/test_bucketed.py asserts exactly that.

This is the Spark-native analog of the reference warehouse's clustered
loads; on a lakehouse the same role is played by Delta/Iceberg
clustering, but plain parquet + catalog bucketing needs no extra
dependency.  Bucket count is a layout contract: both join sides must
agree (or be multiples) for the exchange to be elided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table."""
    writer = (
        df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def drop_table(spark: SparkSession, table_name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
