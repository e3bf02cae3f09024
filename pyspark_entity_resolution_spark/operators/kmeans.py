"""Distributed k-means (Lloyd's) over an ``array<float>`` embedding column.

The iterative-algorithm pattern on DataFrames: each round is one
broadcast-join assignment pass + one aggregation to recompute centroids;
the driver only orchestrates (collects k centroid vectors per round —
O(k·dim), independent of data size). Deterministic by construction:
centroids initialize from the k smallest ids and ties in assignment break
toward the lower centroid id, so repeated runs agree.

This is the engine's representative for genuinely non-SQL-expressible
iterative operators (driver-coordinated fixpoint like connected
components, but with floating-point state), hence its driver-contract
query is a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import as_double


def _sq_dist(vec, centroid_literal) -> "F.Column":
    return F.aggregate(
        F.zip_with(as_double(vec), F.lit(centroid_literal), lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans(
    df: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iterations: int = 5,
) -> DataFrame:
    """Return ``(id, cluster, sq_dist)`` assignments after Lloyd iterations.

    Initial centroids: the k rows with the smallest ids (deterministic).
    Each iteration: centroids are collected to the driver (k·dim floats),
    embedded as literals in the assignment expression (a broadcast in
    spirit — no join shuffle at all), and recomputed with one groupBy.
    """
    init = (
        df.orderBy(id_col)
        .limit(k)
        .select(vec_col)
        .collect()
    )
    centroids: list[list[float]] = [
        [float(x) for x in row[vec_col]] for row in init
    ]

    assignments = None
    for _ in range(max_iterations):
        dists = F.array(*[_sq_dist(F.col(vec_col), c) for c in centroids])
        assignments = df.select(
            F.col(id_col),
            F.col(vec_col),
            F.array_position(dists, F.array_min(dists)).cast("int").alias("cluster"),
            F.array_min(dists).alias("sq_dist"),
        )
        # recompute centroids: per-cluster elementwise mean via posexplode
        exploded = assignments.select(
            "cluster", F.posexplode(as_double(vec_col)).alias("dim", "val")
        )
        means = (
            exploded.groupBy("cluster", "dim")
            .agg(F.avg("val").alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dims"))
            .select(
                "cluster", F.transform("dims", lambda s: s["m"]).alias("centroid")
            )
            .orderBy("cluster")
            .collect()
        )
        new_centroids = list(centroids)
        for row in means:
            new_centroids[row["cluster"] - 1] = [float(x) for x in row["centroid"]]
        if new_centroids == centroids:
            break
        centroids = new_centroids

    return assignments.select(id_col, "cluster", F.round("sq_dist", 4).alias("sq_dist"))


def inertia(assignments: DataFrame) -> float:
    """Total within-cluster squared distance (the k-means objective)."""
    return assignments.agg(F.sum("sq_dist").alias("s")).collect()[0]["s"]
