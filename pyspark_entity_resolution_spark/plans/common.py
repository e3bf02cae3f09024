"""Shared helpers for the driver-contract query registry.

Cross-engine determinism rules used throughout (Spark result must
hash-match the DuckDB oracle on identical parquet inputs):

- Money-like doubles are cast to DECIMAL before SUM (exact, associative,
  order-independent) and the final aggregate is cast back to double.
- Averages are computed as exact-decimal-sum / count, both cast to double,
  in the same expression order on both engines.
- Integer-valued results are cast to BIGINT on both sides (DuckDB
  defaults to BIGINT/HUGEINT; Spark to int/long depending on function).
- Timestamps are rendered as 'yyyy-MM-dd[ HH:mm:ss]' strings (session
  timezone pinned to UTC; the oracle reads the same naive parquet values).
- Ratios of integers and identically-ordered double arithmetic are bit-
  deterministic across engines and need no rounding; accumulations of
  float data are rounded to a fixed number of digits.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    """One driver-contract query: a Spark callable and (optionally) the
    equivalent DuckDB SQL. ``sql=None`` -> rows-only check (for ops that
    are not SQL-expressible, e.g. iterative algorithms)."""

    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None
    doc: str = ""


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")
