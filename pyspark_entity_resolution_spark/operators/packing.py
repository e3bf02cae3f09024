"""Sequence packing: fill fixed-token training sequences from chunks.

The step between chunking and tokenization in an LLM data pipeline:
training consumes fixed-length sequences, so variable-length chunks are
packed into ~``budget``-token groups ("packs") to minimize padding
waste. This is the offset-based formulation: order chunks
deterministically within each group, compute each chunk's running start
offset (one window cumsum), and assign it to pack ``start_offset div
budget``. Every pack holds consecutive chunks totalling ~budget tokens;
a boundary chunk may overflow its pack by less than its own length, and
chunks are NEVER split (the downstream tokenizer handles truncation).

Scale shape: ONE window cumsum partitioned by ``group_col`` (e.g.
source or shard key) — no global ordering bottleneck: each group packs
independently and in parallel, which is also what you want operationally
(packs never mix sources unless asked). Everything stays JVM-side.

No reference analog; part of the training-data-pipeline extension suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_chunks(
    chunks: DataFrame,
    token_col: str = "n_chunk_tokens",
    order_cols: tuple[str, ...] = ("doc_id", "chunk_idx"),
    group_col: str | None = None,
    budget: int = 2048,
) -> DataFrame:
    """Assign every chunk a ``pack_id`` (and position within the pack).

    ``pack_id`` is unique within a group (pair it with ``group_col`` for
    a global key). Deterministic: same input rows -> same packing,
    independent of partitioning. ``order_cols`` SHOULD be a unique key
    within each group (it is the packing order); when it is not, a
    row-content hash (``xxhash64`` over all columns) breaks ties, so
    the assignment is still reproducible run-to-run — but the relative
    order of fully-identical rows is then arbitrary-but-fixed rather
    than meaningful.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    part = [group_col] if group_col else []
    tiebreak = F.xxhash64(*[F.col(c) for c in chunks.columns])
    order = [F.col(c) for c in order_cols] + [tiebreak]
    w = Window.partitionBy(*part).orderBy(*order)
    start = (
        F.sum(F.col(token_col)).over(w.rowsBetween(Window.unboundedPreceding, 0))
        - F.col(token_col)
    )
    return (
        chunks.withColumn("__start", start)
        .withColumn("pack_id", F.floor(F.col("__start") / budget).cast("bigint"))
        .withColumn(
            "pack_pos",
            F.row_number().over(
                Window.partitionBy(*part, "pack_id").orderBy(*order)
            ),
        )
        .drop("__start")
    )


def pack_summary(
    packed: DataFrame,
    token_col: str = "n_chunk_tokens",
    group_col: str | None = None,
    budget: int | None = None,
) -> DataFrame:
    """Per-pack report: ``(pack_id, n_chunks, n_tokens)`` — the
    padding-waste audit. ``budget`` is not re-derivable from the packed
    rows; pass the one given to ``pack_chunks`` to also get
    ``fill = n_tokens/budget`` (boundary-chunk overflow makes fill > 1
    possible by design)."""
    part = [group_col] if group_col else []
    out = packed.groupBy(*part, "pack_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(token_col).cast("bigint").alias("n_tokens"),
    )
    if budget is not None:
        out = out.withColumn(
            "fill", F.col("n_tokens") / F.lit(float(budget))
        )
    return out
