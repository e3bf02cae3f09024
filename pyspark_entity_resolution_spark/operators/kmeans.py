"""Distributed k-means (Lloyd's) over an ``array<float>`` embedding column.

The iterative-algorithm pattern on DataFrames: each round is one
broadcast-join assignment pass + one aggregation to recompute centroids;
the driver only orchestrates (collects k centroid vectors per round —
O(k·dim), independent of data size). Deterministic by construction:
centroids initialize from the k smallest ids and ties in assignment break
toward the lower centroid id, so repeated runs agree.

Oracle-grade determinism (``quantize=d``): embedding components are first
quantized to integers via ``floor(x * 10^d + 0.5)``. Every subsequent
operation is then bit-deterministic across engines and shuffle orders:
integer-valued doubles below 2^53 sum exactly (associative), centroid
means are exact-integer-sum / count (one IEEE division), and distances
fold in element order. That makes a fixed-iteration Lloyd's run exactly
reproducible in ANSI SQL — the driver-contract query unrolls the same
iterations in DuckDB (see plans/queries_vector.kmeans_assignments).
With ``quantize=None`` (default) the operator runs on raw floats; the
float mean is shuffle-order dependent, so that mode is rows-only
checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import as_double


def _sq_dist(vec_sql: str, centroid_literal) -> "F.Column":
    # ONE F.expr call instead of dim lit() round-trips + two lambda
    # handshakes per centroid — identical parsed expression (same
    # zip_with/aggregate fold, same 0.0 init; see functions/vectors.py
    # r11 construction-cost note). k centroids x iterations made the
    # composed form ~half of this operator's driver-side build time.
    arr = "array(" + ", ".join(f"{v!r}D" for v in centroid_literal) + ")"
    return F.expr(
        f"aggregate(zip_with(transform({vec_sql}, x -> cast(x as double)), "
        f"{arr}, (x, c) -> (x - c) * (x - c)), 0.0D, (acc, x) -> acc + x)"
    )


def kmeans(
    df: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iterations: int = 5,
    quantize: int | None = None,
) -> DataFrame:
    """Return ``(id, cluster, sq_dist)`` assignments after Lloyd iterations.

    Initial centroids: the k rows with the smallest ids (deterministic).
    Each iteration: centroids are collected to the driver (k·dim floats),
    embedded as literals in the assignment expression (a broadcast in
    spirit — no join shuffle at all), and recomputed with one groupBy.

    ``quantize=d`` runs on ``floor(x * 10^d + 0.5)``-quantized components
    for cross-engine bit determinism (see module docstring); ``sq_dist``
    is then in quantized-squared units and emitted unrounded (it is
    bit-exact, so no rounding is needed for oracle comparison).
    """
    if quantize is not None:
        scale = float(10 ** quantize)
        work = df.select(
            id_col,
            F.transform(
                as_double(vec_col),
                lambda x: F.floor(x * scale + F.lit(0.5)).cast("double"),
            ).alias("__v"),
        )
    else:
        work = df.select(id_col, as_double(vec_col).alias("__v"))
    # the quantized working set feeds the init collect, every Lloyd
    # iteration's mean job, and the returned assignment plan — without a
    # barrier each of those re-scans the source and re-quantizes (r11:
    # max_iterations + 2 full corpus re-reads saved per call)
    work = work.localCheckpoint(eager=False)

    init = work.orderBy(id_col).limit(k).select("__v").collect()
    centroids: list[list[float]] = [[float(x) for x in row["__v"]] for row in init]
    dims = max((len(c) for c in centroids), default=0)

    assignments = None
    for _ in range(max_iterations):
        dists = F.array(*[_sq_dist("`__v`", c) for c in centroids])
        assignments = work.select(
            F.col(id_col),
            F.col("__v"),
            F.array_position(dists, F.array_min(dists)).cast("bigint").alias("cluster"),
            F.array_min(dists).alias("sq_dist"),
        )
        # recompute centroids: per-cluster elementwise mean as ONE
        # hash aggregate of `dims` per-dim sum columns over a shared
        # count(1) — map-side partial aggregation, one k-row shuffle.
        # (The previous posexplode shape pushed rows x dims exploded
        # rows through TWO shuffles per iteration just to reassemble
        # the same k·dims means.) `sum(get(__v, d)) / count(1)` is the
        # exact division the exploded form computed — including on a
        # vector with a NULL element, where the r11 `count(get(...))`
        # denominator silently counted non-NULL rows only (ADVICE r11):
        # quantized components are integer-valued doubles (exact,
        # order-free sum) and count(1) is the cluster's row count, the
        # posexplode form's denominator. Fixed-dim embeddings are
        # asserted (loudly) below — the old shape silently averaged
        # ragged corpora per-dim; this one refuses them instead of
        # guessing.
        stats = (
            assignments.groupBy("cluster")
            .agg(
                F.expr("min(size(__v)) AS __mn"),
                F.expr("max(size(__v)) AS __mx"),
                *[
                    F.expr(f"sum(get(__v, {d})) / count(1) AS m{d}")
                    for d in range(dims)
                ],
            )
            .collect()
        )
        new_centroids = list(centroids)
        for row in stats:
            if row["__mn"] != dims or row["__mx"] != dims:
                raise ValueError(
                    "kmeans requires fixed-dimension embeddings: saw sizes "
                    f"{row['__mn']}..{row['__mx']} vs init dim {dims}"
                )
            new_centroids[row["cluster"] - 1] = [
                float(row[f"m{d}"]) for d in range(dims)
            ]
        if new_centroids == centroids:
            break
        centroids = new_centroids

    if quantize is not None:
        return assignments.select(id_col, "cluster", "sq_dist")
    return assignments.select(id_col, "cluster", F.round("sq_dist", 4).alias("sq_dist"))


def inertia(assignments: DataFrame) -> float:
    """Total within-cluster squared distance (the k-means objective)."""
    return assignments.agg(F.sum("sq_dist").alias("s")).collect()[0]["s"]
