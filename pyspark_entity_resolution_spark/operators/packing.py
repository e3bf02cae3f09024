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
    independent of partitioning, because the order inside a group is
    pinned by ``order_cols``.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    part = [group_col] if group_col else []
    w = Window.partitionBy(*part).orderBy(*[F.col(c) for c in order_cols])
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
                Window.partitionBy(*part, "pack_id").orderBy(
                    *[F.col(c) for c in order_cols]
                )
            ),
        )
        .drop("__start")
    )


def pack_summary(
    packed: DataFrame,
    token_col: str = "n_chunk_tokens",
    group_col: str | None = None,
) -> DataFrame:
    """Per-pack fill report: chunks, tokens, and fill ratio against the
    dominant use (padding-waste audit). ``budget`` is not re-derivable
    from the packed rows, so the caller divides: fill = n_tokens/budget."""
    part = [group_col] if group_col else []
    return packed.groupBy(*part, "pack_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(token_col).cast("bigint").alias("n_tokens"),
    )
