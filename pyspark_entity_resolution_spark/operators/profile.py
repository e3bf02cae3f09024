"""Single-pass dataset profiling for large-scale training-data pipelines.

Profiling is the first stage of any 100 TB ingest: per-column null rates,
cardinalities, ranges and value skew decide partitioning keys, dedup
strategy and quality filters before any expensive pass runs. Everything
here is a declarative aggregate so Catalyst fuses it into ONE scan with
map-side partial aggregation:

- :func:`profile_columns` — exact profile. Multiple ``COUNT(DISTINCT)``
  aggregates make Spark expand each input row once per distinct-aggregate
  (the Expand operator), so a k-column exact profile costs a k-fold row
  expansion inside a single scan. Correct at any scale, but at extreme
  width prefer the sketch variant.
- :func:`profile_columns_approx` — the 100 TB path: HyperLogLog++
  cardinalities (``approx_count_distinct``) and sketch percentiles
  (``approx_percentile``) replace the distinct expansion; one scan, no
  row multiplication, bounded error (``rsd``).
- :func:`group_percentiles` — exact interpolated percentiles per group
  (Spark ``percentile``; single hash aggregate).
- :func:`heavy_hitters` — exact top-k most frequent values: two-phase
  hash aggregate (map-side combine) + a global top-k, the shape that
  survives skew because the partial aggregation collapses hot keys
  before the shuffle.

All emit the same long-format schema
``(section, key, metric, value_num, value_str)`` so profiles compose
with ``unionByName`` into one report table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

_SCHEMA_FIELDS = ("section", "key", "metric", "value_num", "value_str")


def _entry(section: str, key: str, metric: str, num: Column | None,
           s: Column | None) -> Column:
    return F.struct(
        F.lit(section).alias("section"),
        F.lit(key).alias("key"),
        F.lit(metric).alias("metric"),
        (num if num is not None else F.lit(None)).cast("double").alias("value_num"),
        (s if s is not None else F.lit(None)).cast("string").alias("value_str"),
    )


def _mean_exact(c: Column) -> Column:
    """Order-independent mean for floating columns: accumulate in DECIMAL
    (exact, commutative) and divide once — bit-identical across engines
    and partitionings, unlike a double sum whose value depends on
    reduction order."""
    return F.round(
        F.sum(c.cast("decimal(30,6)")).cast("double") / F.count(c), 4
    )


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    include_stddev: bool = True,
    section: str = "column",
) -> DataFrame:
    """Exact per-column profile in ONE aggregate over one scan.

    Per column: ``n_null``, ``n_distinct`` (exact), ``min``/``max``
    (``value_num`` for numerics, ``value_str`` otherwise), and for
    numerics ``avg`` (decimal-accumulated, round 4) and optionally
    ``stddev`` (sample, round 4 — float-accumulated, so cross-engine
    comparisons should exclude it). Plus one ``(table, n_rows)`` row.
    """
    columns = list(columns) if columns is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).alias("__n")]
    numeric: dict[str, bool] = {}
    for c in columns:
        numeric[c] = isinstance(df.schema[c].dataType, NumericType)
        col = F.col(c)
        aggs.append(F.count(col).alias(f"nn__{c}"))
        aggs.append(F.count_distinct(col).alias(f"nd__{c}"))
        aggs.append(F.min(col).alias(f"mn__{c}"))
        aggs.append(F.max(col).alias(f"mx__{c}"))
        if numeric[c]:
            aggs.append(_mean_exact(col).alias(f"av__{c}"))
            if include_stddev:
                aggs.append(F.round(F.stddev_samp(col), 4).alias(f"sd__{c}"))
    row = df.agg(*aggs)

    entries = [_entry("table", "*", "n_rows", F.col("__n"), None)]
    for c in columns:
        nc = F.col(f"nn__{c}")
        entries.append(_entry(section, c, "n_null", F.col("__n") - nc, None))
        entries.append(_entry(section, c, "n_distinct", F.col(f"nd__{c}"), None))
        if numeric[c]:
            entries.append(_entry(section, c, "min", F.col(f"mn__{c}"), None))
            entries.append(_entry(section, c, "max", F.col(f"mx__{c}"), None))
            entries.append(_entry(section, c, "avg", F.col(f"av__{c}"), None))
            if include_stddev:
                entries.append(_entry(section, c, "stddev", F.col(f"sd__{c}"), None))
        else:
            entries.append(_entry(section, c, "min", None, F.col(f"mn__{c}")))
            entries.append(_entry(section, c, "max", None, F.col(f"mx__{c}")))
    return row.select(F.explode(F.array(*entries)).alias("e")).select("e.*")


def profile_columns_approx(
    df: DataFrame,
    columns: list[str] | None = None,
    rsd: float = 0.05,
    percentiles: tuple[float, ...] = (0.5, 0.95),
    accuracy: int = 10000,
    section: str = "column_approx",
) -> DataFrame:
    """Sketch-based profile — the shape to run on the full 100 TB table.

    ``approx_count_distinct`` (HyperLogLog++, relative error ``rsd``)
    avoids the k-fold Expand of exact multi-distinct; numeric percentiles
    come from ``approx_percentile`` (Greenwald-Khanna style sketch,
    rank error 1/``accuracy``). Still ONE scan, one ordinary aggregate,
    fully map-side combinable.
    """
    columns = list(columns) if columns is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).alias("__n")]
    numeric: dict[str, bool] = {}
    for c in columns:
        numeric[c] = isinstance(df.schema[c].dataType, NumericType)
        col = F.col(c)
        aggs.append(F.count(col).alias(f"nn__{c}"))
        aggs.append(F.approx_count_distinct(col, rsd).alias(f"nd__{c}"))
        if numeric[c]:
            aggs.append(
                F.percentile_approx(
                    col, F.lit(list(percentiles)).cast("array<double>"),
                    F.lit(accuracy),
                ).alias(f"pc__{c}")
            )
    row = df.agg(*aggs)

    entries = [_entry("table", "*", "n_rows", F.col("__n"), None)]
    for c in columns:
        entries.append(
            _entry(section, c, "n_null", F.col("__n") - F.col(f"nn__{c}"), None)
        )
        entries.append(
            _entry(section, c, "approx_n_distinct", F.col(f"nd__{c}"), None)
        )
        if numeric[c]:
            for i, p in enumerate(percentiles):
                entries.append(
                    _entry(
                        section, c, f"approx_p{int(p * 100)}",
                        F.get(F.col(f"pc__{c}"), i), None,
                    )
                )
    return row.select(F.explode(F.array(*entries)).alias("e")).select("e.*")


def group_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    percentiles: dict[str, float],
    section: str = "percentile",
) -> DataFrame:
    """Exact interpolated percentiles of ``value_col`` per group, in the
    long profile schema (one row per (group, named percentile))."""
    aggs = [
        F.round(F.percentile(value_col, F.lit(p)), 4).alias(name)
        for name, p in percentiles.items()
    ]
    g = df.groupBy(group_col).agg(*aggs)
    entries = [
        _entry(section, "", name, F.col(name), None) for name in percentiles
    ]
    # key is the group value; _entry bakes literals, so patch key per row
    exploded = g.select(
        F.col(group_col).cast("string").alias("__k"),
        F.explode(F.array(*entries)).alias("e"),
    )
    return exploded.select(
        F.col("e.section").alias("section"),
        F.col("__k").alias("key"),
        F.col("e.metric").alias("metric"),
        F.col("e.value_num").alias("value_num"),
        F.col("e.value_str").alias("value_str"),
    )


def heavy_hitters(
    df: DataFrame, col: str, k: int = 10, section: str = "topk"
) -> DataFrame:
    """Exact k most frequent values of ``col``; ties broken by value.

    Two-phase hash aggregate then a global limit: hot keys collapse in
    the map-side partial, so value skew cannot overload one reducer.
    """
    counts = df.groupBy(F.col(col).cast("string").alias("__v")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    top = counts.orderBy(F.col("__c").desc(), F.col("__v")).limit(k)
    return top.select(
        F.lit(section).alias("section"),
        F.col("__v").alias("key"),
        F.lit("count").alias("metric"),
        F.col("__c").cast("double").alias("value_num"),
        F.lit(None).cast("string").alias("value_str"),
    )
