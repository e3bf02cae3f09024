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
    are not SQL-expressible, e.g. iterative algorithms).

    ``adaptive_sql``: optional ``sf_dir -> SQL`` generator for queries
    whose oracle depends on corpus scale (e.g. adaptive LSH plane
    counts). The driver contract only sees the static ``sql`` (valid at
    gate scale, guarded in-query); tools/check_oracle.py prefers
    ``adaptive_sql`` so above-gate spot-checks value-compare instead of
    degrading to rows-only."""

    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None
    doc: str = ""
    adaptive_sql: "Callable[[str], str] | None" = None


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _table_files(sf_dir: str, table: str) -> list[str]:
    """The data files ``spark.read.parquet`` would read for a table:
    the path itself when it is a plain file, else every non-hidden,
    non-underscore file in the directory (Spark's InMemoryFileIndex
    filter — NOT just ``*.parquet``: a fixture written with custom
    naming must count the same here as in ``df.count()``, or the
    planning-time scalars drift from what the query computes). Raises
    when the directory matches nothing: a silent 0 would flip
    choose_num_planes / n_docs and break oracle hash agreement."""
    import os

    path = f"{sf_dir}/{table}.parquet"
    if not os.path.isdir(path):
        return [path]
    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if not f.startswith((".", "_")) and os.path.isfile(os.path.join(path, f))
    )
    if not files:
        raise FileNotFoundError(f"no data files under {path}")
    return files


def table_rowcount(sf_dir: str, table: str) -> int:
    """Row count of a testdata table from its parquet footers — exactly
    the n a ``load(...).count()`` job returns, without running a Spark
    job (r11: query builders that need a planning-time scalar count —
    LSH plane sizing, the TF-IDF n_docs — read it here instead of
    paying a full scan per plan build)."""
    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(f).metadata.num_rows for f in _table_files(sf_dir, table)
    )


def table_bytes(sf_dir: str, table: str) -> int:
    """On-disk bytes of a testdata table (file metadata only, no job) —
    the planning-time input to :func:`spread`'s width decision."""
    import os

    return sum(os.path.getsize(f) for f in _table_files(sf_dir, table))


def spread(
    spark: SparkSession,
    df: DataFrame,
    factor: int = 1,
    input_bytes: int | None = None,
) -> DataFrame:
    """Repartition to cluster parallelism — IF the scan is narrow.

    The testdata tables are single small parquet files -> one input
    partition; any pair-generating join downstream would otherwise run on
    ONE task (the build side broadcasts, so the probe side's partitioning
    dictates parallelism), and per-row CPU work (tokenize, md5, decimal
    partial aggregation) runs one-core. Locally this round-robin is the
    difference between 1 and 32 cores.

    ``input_bytes`` (r11): when the caller knows the scan's on-disk size
    (:func:`table_bytes` — file metadata, no job), the repartition is
    SKIPPED whenever the scan already splits into at least
    ``defaultParallelism * factor`` tasks under the session's
    ``spark.sql.files.maxPartitionBytes``. The old unconditional form
    was described as "no-op-ish at scale" — it is not: a round-robin of
    a pre-partitioned 100 TB input is a full shuffle of every byte
    (guide §2.4). With the estimate wired in, the local single-file
    corpora still fan out and a wide production scan pays nothing.
    Callers without a byte estimate keep the unconditional behavior.
    Prefer :func:`load_spread` for the common load-then-spread shape.
    """
    target = spark.sparkContext.defaultParallelism * factor
    if input_bytes is not None:
        max_split = _parse_byte_string(
            spark.conf.get("spark.sql.files.maxPartitionBytes")
        )
        if -(-input_bytes // max_split) >= target:
            return df
    return df.repartition(target)


def _parse_byte_string(raw: str, default: int = 128 * 1024**2) -> int:
    """Spark byte-string conf value -> bytes. Accepts every legal form
    (``134217728``, ``128m``, ``128mb``, ``1g`` — case-insensitive; the
    r11 parser crashed on two-letter suffixes like ``128mb`` and
    silently misread unknown ones). Any unparseable value falls back to
    ``default`` (Spark's 128 MB) instead of raising: the caller uses
    the number only to DECIDE whether a repartition is worthwhile, and
    a conservative guess must never fail query build."""
    import re

    m = re.fullmatch(
        r"\s*(\d+)\s*([kmgtp]?)b?\s*", str(raw), flags=re.IGNORECASE
    )
    if not m:
        return default
    units = {"": 1, "k": 1024, "m": 1024**2, "g": 1024**3,
             "t": 1024**4, "p": 1024**5}
    return int(m.group(1)) * units[m.group(2).lower()]


def load_spread(
    spark: SparkSession, sf_dir: str, table: str, factor: int = 1
) -> DataFrame:
    """``spread(load(...))`` with the table's on-disk size wired into
    the width decision — the standard way to open a table whose rows
    feed CPU-heavy projections or pair-generating joins."""
    return spread(
        spark, load(spark, sf_dir, table), factor,
        input_bytes=table_bytes(sf_dir, table),
    )


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize the events table's ``ts`` to a timestamp across generator
    vintages: newer testdata writes parquet TIMESTAMP(MICROS) (read
    natively), older testdata wrote TIMESTAMP(NANOS) which Spark's
    vectorized reader rejects outright (PARQUET_TYPE_ILLEGAL) — for that
    shape, read nanos as long and rebuild the timestamp (lossless: the
    generator's values are microsecond-precision)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = load(spark, sf_dir, "events")
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        df = df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("bigint"))
        )
    elif isinstance(ts_type, T.TimestampNTZType):
        # driver tables are UTC wall-clock; session timezone is UTC
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
