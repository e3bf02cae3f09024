"""SemDedup-style semantic deduplication over embedding columns.

The SemDedup recipe (Abbas et al., 2023, arXiv:2303.09540): cluster the
embedding space with k-means, then look for cosine near-duplicates ONLY
within each cluster, and keep one representative per duplicate group.
Clustering bounds the pair search the way LSH bucketing does, but with
semantically meaningful blocks — the standard trade for web-scale
training corpora.

Built entirely as a composition of this engine's existing operators:
:func:`operators.kmeans.kmeans` (deterministic Lloyd's) provides the
blocks, :func:`operators.ann.embedding_near_duplicates` the
within-block pair scan, and :func:`operators.clustering.
connected_components` (the ER large-star/small-star operator) the
duplicate-group closure — so a near-dup chain a~b~c collapses to ONE
survivor even when a and c were never directly compared.

Scale shape: k-means assignment is a broadcast-literal scan (k·dim
floats per round); the pair scan is bounded by the largest cluster
(k is the occupancy dial — grow it with corpus size exactly like
LSH planes); components run on the near-dup edge list, which is tiny
relative to the corpus. No all-pairs stage anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ann import embedding_near_duplicates
from .clustering import connected_components
from .kmeans import kmeans


def semdedup_pairs(
    df: DataFrame,
    k: int = 8,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iterations: int = 3,
) -> DataFrame:
    """Within-cluster cosine near-duplicate pairs: (a_id, b_id, cos_sim)."""
    assignments = kmeans(
        df, k=k, id_col=id_col, vec_col=vec_col, max_iterations=max_iterations
    ).select(id_col, "cluster")
    blocked = df.join(assignments, on=id_col)
    return embedding_near_duplicates(
        blocked,
        id_col=id_col,
        vec_col=vec_col,
        block_col="cluster",
        threshold=threshold,
    )


def semdedup(
    df: DataFrame,
    k: int = 8,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iterations: int = 3,
) -> DataFrame:
    """Deduplicated corpus: drops every vector whose duplicate-group
    representative (min id in the connected near-dup component) is not
    itself. Returns the surviving rows of ``df`` unchanged."""
    pairs = semdedup_pairs(df, k, threshold, id_col, vec_col, max_iterations)
    comps = connected_components(pairs, src="a_id", dst="b_id")
    reps = comps.groupBy("component").agg(F.min("node").alias("keep"))
    drop = (
        comps.join(reps, on="component")
        .filter(F.col("node") != F.col("keep"))
        .select(F.col("node").alias(id_col))
    )
    return df.join(drop, on=id_col, how="left_anti")
