"""Bucketed-table layout for co-located, shuffle-free joins.

At 100 TB the dominant cost of fact-fact joins (orders ⋈ lineitem,
candidate-pair scoring against a big cleaned corpus) is the shuffle.
Writing both sides bucketed by the join key with the same bucket count
lets Spark plan a sort-merge join with NO Exchange on either side — the
bucketing IS the shuffle, paid once at layout time and amortized over
every subsequent join.

Spark's bucketing rides on ``saveAsTable`` (metastore-backed); these
helpers wrap the write/read and keep the bucket spec in one place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a Hive-bucketed parquet table: equi-joins/aggs on the
    bucket columns read co-located, with no shuffle Exchange
    (plan-shape-tested in tests/test_bucketing.py)."""
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a saved (bucketed) table by name."""
    return spark.table(table)
