"""Distributed connected components (entity clustering).

The reference collects every matched pair to the driver, builds a Python
adjacency dict, and runs recursive DFS (reference src/clustering.py:6-54,
G1 in SURVEY.md §2.8) — O(matches) driver memory and a recursion-depth
crash on long chains. This module replaces it with iterative min-label
propagation over DataFrames:

    label(n) <- min(label(n), min over neighbors m of label(m))

repeated to fixpoint. Converges in O(graph diameter) rounds; duplicate
graphs are near-bipartite with tiny diameter, so 2-4 rounds in practice.
Every round is one shuffle join + one aggregation; lineage is truncated
with ``localCheckpoint`` so plans don't grow across iterations. The final
component id is the lexicographic/numeric MIN node id in the component —
deterministic, unlike the reference's enumeration-order cluster ids
(SURVEY.md §7.3: compare cluster *partitions*, not ids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """Return ``(node, component)`` for every node appearing in ``edges``.

    Node columns may be any orderable type (string node keys are fine —
    namespace ids from different datasets, e.g. ``"a:" + id``).
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    sym = sym.localCheckpoint()

    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )

    for _ in range(max_iterations):
        # one-hop min over neighbors; the node's previous label rides along
        # through the aggregate so convergence needs no separate join
        neighbor_min = sym.join(labels, sym.v == labels.node).select(
            F.col("u").alias("node"),
            F.col("component"),
            F.lit(None).cast(labels.schema["component"].dataType).alias("old"),
        )
        own = labels.select(
            "node", "component", F.col("component").alias("old")
        )
        stepped = (
            own.unionByName(neighbor_min)
            .groupBy("node")
            .agg(
                F.min("component").alias("component"),
                F.max("old").alias("old"),
            )
        )
        # pointer jumping (path doubling): adopt the label OF the label —
        # component ids are themselves node ids, so one self-join halves
        # the remaining propagation distance each round -> O(log diameter)
        rep = stepped.select(
            F.col("node").alias("component"), F.col("component").alias("jumped")
        )
        new_labels = (
            stepped.join(rep, on="component", how="left")
            .select(
                "node",
                F.coalesce("jumped", "component").alias("component"),
                "old",
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("component") != F.col("old")).count()
        labels = new_labels.select("node", "component")
        if changed == 0:
            break
    return labels


def cluster_matched_pairs(
    matches: DataFrame,
    left_id: str,
    right_id: str,
    left_name: str = "a",
    right_name: str = "b",
) -> DataFrame:
    """Cluster matched pairs into entities.

    Node identity is ``(id, dataset)`` — the reference keys nodes by a
    (id, title, authors, dataset) tuple (src/clustering.py:17-21) because
    synthetic ids collide across datasets; namespacing the id with the
    dataset name is sufficient and join-free. Returns
    ``(id, df_name, cluster_id)`` with a deterministic dense cluster id
    derived from the min member key.
    """
    edges = matches.select(
        F.concat(F.lit(left_name + ":"), F.col(left_id).cast("string")).alias("src"),
        F.concat(F.lit(right_name + ":"), F.col(right_id).cast("string")).alias("dst"),
    )
    components = connected_components(edges)
    split = F.split(F.col("node"), ":", 2)
    return components.select(
        split.getItem(1).alias("id"),
        split.getItem(0).alias("df_name"),
        F.col("component").alias("cluster_id"),
    )
