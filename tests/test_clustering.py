"""Distributed connected-components tests (replaces reference driver DFS,
src/clustering.py:6-54)."""

from pyspark_entity_resolution_spark.operators.clustering import (
    cluster_matched_pairs,
    connected_components,
)


def _components_as_partitions(rows):
    from collections import defaultdict

    groups = defaultdict(set)
    for r in rows:
        groups[r["component"]].add(r["node"])
    return {frozenset(g) for g in groups.values()}


def test_chain_and_fanout(spark):
    # chain a-b-c-d plus fan-out e-{f,g}, isolated pair h-i
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("e", "f"), ("e", "g"), ("h", "i")],
        ["src", "dst"],
    )
    got = _components_as_partitions(connected_components(edges).collect())
    assert got == {
        frozenset({"a", "b", "c", "d"}),
        frozenset({"e", "f", "g"}),
        frozenset({"h", "i"}),
    }


def test_long_chain_converges(spark):
    # a 40-node path: the worst case for label propagation (diameter 40);
    # the reference's recursive DFS would be fine here but crashes at
    # recursion depth ~1000 — ours is bounded by iterations, not depth.
    n = 40
    edges = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(n)], ["src", "dst"]
    )
    rows = connected_components(edges, max_iterations=64).collect()
    comps = {r["component"] for r in rows}
    assert comps == {"n000"}  # min label wins
    assert len(rows) == n + 1


def test_cycle(spark):
    edges = spark.createDataFrame(
        [("x", "y"), ("y", "z"), ("z", "x")], ["src", "dst"]
    )
    got = _components_as_partitions(connected_components(edges).collect())
    assert got == {frozenset({"x", "y", "z"})}


def test_cluster_matched_pairs_namespacing(spark):
    # same numeric id on both sides must NOT merge (distinct datasets)
    matches = spark.createDataFrame(
        [(1, 1), (2, 3)], ["a_id", "b_id"]
    )
    rows = cluster_matched_pairs(matches, "a_id", "b_id").collect()
    from collections import defaultdict

    groups = defaultdict(set)
    for r in rows:
        groups[r["cluster_id"]].add((r["df_name"], r["id"]))
    parts = {frozenset(g) for g in groups.values()}
    assert parts == {
        frozenset({("a", "1"), ("b", "1")}),
        frozenset({("a", "2"), ("b", "3")}),
    }


def test_explicit_checkpoint_storage_and_probes(spark):
    """checkpoint_storage overrides the memory-aware choice without
    changing results, and the storage probes the choice rests on return
    sane values on a materialized checkpoint (real footprint > 0, real
    heap > 0) — if either probe ever breaks, the demotion heuristic
    silently degrades to always-DISK_ONLY on huge graphs, a measured
    ~1.3x wall-clock loss on big heaps."""
    from pyspark import StorageLevel

    from pyspark_entity_resolution_spark.operators.clustering import (
        _checkpoint_bytes,
        _jvm_max_heap,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], ["src", "dst"]
    )
    got = _components_as_partitions(
        connected_components(
            edges, checkpoint_storage=StorageLevel.DISK_ONLY
        ).collect()
    )
    assert got == {frozenset({"a", "b", "c"}), frozenset({"x", "y"})}

    ck = edges.localCheckpoint()
    ck.count()
    assert (_checkpoint_bytes(ck) or 0) > 0
    ck.unpersist()
    assert (_jvm_max_heap(spark) or 0) > 0


def test_pinned_exchange_path_matches_default(spark, monkeypatch):
    """The per-star exchange pin is volume-gated (PIN_EXCHANGE_ABOVE_EDGES,
    2M), so ordinary test graphs never execute the pinned star plans —
    force the gate to zero and assert the pinned path labels a random
    graph identically to the default path. Guards the pin's rewiring
    algebra (the repartition must not change which rows meet which
    minima), not its performance. The pin exists only in the JOIN star
    implementation (r7 default is window), so both arms run under
    SPARK_GRAFT_CC_STAR=join."""
    import random

    from pyspark_entity_resolution_spark.operators import clustering as C

    rng = random.Random(42)
    n_nodes, n_edges = 400, 900
    edges = spark.createDataFrame(
        [
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(n_edges)
        ],
        ["src", "dst"],
    )
    monkeypatch.setenv("SPARK_GRAFT_CC_STAR", "join")
    baseline = _components_as_partitions(
        connected_components(edges).collect()
    )
    monkeypatch.setattr(C, "PIN_EXCHANGE_ABOVE_EDGES", 0)
    pinned = _components_as_partitions(
        connected_components(edges).collect()
    )
    assert pinned == baseline


def test_window_star_impl_matches_join_impl(spark, monkeypatch):
    """SPARK_GRAFT_CC_STAR=window selects the join-free window-function
    stars; each star's rewiring must equal the join form's row set, and
    end-to-end labeling must be identical on a random multigraph (with
    self-loops and duplicate edges, the inputs that stress the
    filter/distinct placement)."""
    import random

    from pyspark_entity_resolution_spark.operators.clustering import (
        _large_star,
        _large_star_window,
        _small_star,
        _small_star_window,
    )

    rng = random.Random(99)
    n_nodes, n_edges = 300, 700
    raw = [
        (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
    ] + [(5, 5), (7, 7), (10, 20), (10, 20)]  # self-loops + dup edges
    edges = spark.createDataFrame(raw, ["src", "dst"])
    e = edges.select(
        edges.src.alias("u"), edges.dst.alias("v")
    ).filter("u <> v")

    j_large = {(r["u"], r["v"]) for r in _large_star(e, pin=False).collect()}
    w_large = {(r["u"], r["v"]) for r in _large_star_window(e).collect()}
    assert w_large == j_large

    j_small = {(r["u"], r["v"]) for r in _small_star(e, pin=False).collect()}
    w_small = {(r["u"], r["v"]) for r in _small_star_window(e).collect()}
    assert w_small == j_small

    monkeypatch.setenv("SPARK_GRAFT_CC_STAR", "join")
    baseline = _components_as_partitions(connected_components(edges).collect())
    monkeypatch.setenv("SPARK_GRAFT_CC_STAR", "window")
    windowed = _components_as_partitions(connected_components(edges).collect())
    assert windowed == baseline


def test_nodistinct_star_impl_matches_join_impl(spark, monkeypatch):
    """The r8 fused-dedup stars (SPARK_GRAFT_CC_STAR=window-nodistinct)
    drop the round-final distinct and dedup each star's INPUT inside its
    window pass instead — their output may carry bounded duplicate rows,
    but the edge SET per star must equal the join form's exactly, the
    duplicate multiplicity must stay bounded (output rows <= distinct
    input edges + centers, never multiset blowup), and end-to-end labels
    must be identical on a random multigraph with self-loops and
    duplicate edges."""
    import random

    from pyspark.sql import functions as F

    from pyspark_entity_resolution_spark.operators.clustering import (
        _large_star,
        _large_star_window_nodistinct,
        _small_star,
        _small_star_window_nodistinct,
    )

    rng = random.Random(1234)
    n_nodes, n_edges = 300, 700
    raw = [
        (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
    ] + [(5, 5), (7, 7), (10, 20), (10, 20), (20, 10)]  # loops + dups both ways
    edges = spark.createDataFrame(raw, ["src", "dst"])
    e = edges.select(
        edges.src.alias("u"), edges.dst.alias("v")
    ).filter("u <> v")

    j_large = {(r["u"], r["v"]) for r in _large_star(e, pin=False).collect()}
    nd_large_rows = [
        (r["u"], r["v"]) for r in _large_star_window_nodistinct(e).collect()
    ]
    assert set(nd_large_rows) == j_large
    # input dedup bounds emission: one row per DISTINCT undirected edge
    n_distinct_edges = e.select(
        F.least("u", "v"), F.greatest("u", "v")
    ).distinct().count()
    assert len(nd_large_rows) <= n_distinct_edges

    j_small = {(r["u"], r["v"]) for r in _small_star(e, pin=False).collect()}
    nd_small_rows = [
        (r["u"], r["v"])
        for r in _small_star_window_nodistinct(e).collect()
    ]
    assert set(nd_small_rows) == j_small
    n_centers = e.select(F.greatest("u", "v")).distinct().count()
    assert len(nd_small_rows) <= n_distinct_edges + n_centers

    monkeypatch.setenv("SPARK_GRAFT_CC_STAR", "join")
    baseline = _components_as_partitions(connected_components(edges).collect())
    monkeypatch.setenv("SPARK_GRAFT_CC_STAR", "window-nodistinct")
    fused = _components_as_partitions(connected_components(edges).collect())
    assert fused == baseline


def test_nodistinct_star_long_chain_and_string_keys(spark, monkeypatch):
    """Convergence-sensitive shapes under the fused-dedup stars: a long
    chain (max alternating-star rounds for the node count) and
    string-namespaced node keys (the cluster_matched_pairs path) — the
    duplicate-tolerant probe must still declare the true fixed point
    and only it."""
    monkeypatch.setenv("SPARK_GRAFT_CC_STAR", "window-nodistinct")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], ["src", "dst"]
    )
    parts = _components_as_partitions(connected_components(chain).collect())
    assert parts == {frozenset(range(201))}

    named = spark.createDataFrame(
        [("a:1", "b:2"), ("b:2", "a:3"), ("a:9", "b:9")], ["src", "dst"]
    )
    parts = _components_as_partitions(connected_components(named).collect())
    assert parts == {frozenset({"a:1", "b:2", "a:3"}), frozenset({"a:9", "b:9"})}


def test_round_stats_diagnostic_records_every_round(spark):
    """LAST_RUN_ROUND_STATS (r9, feeding the century-cc probe's
    per-round decomposition): one entry per executed round, seconds
    positive, edge counts non-increasing after the first star pass
    settles, and the final round is the probed one that converged."""
    from pyspark.sql import functions as F

    from pyspark_entity_resolution_spark.operators import clustering

    edges = spark.range(2000).select(
        (F.abs(F.xxhash64("id")) % 600).alias("src"),
        (F.abs(F.xxhash64(F.col("id") + 7)) % 600).alias("dst"),
    )
    clustering.connected_components(edges).count()
    stats = clustering.LAST_RUN_ROUND_STATS
    assert stats, "no rounds recorded"
    assert all(s["sec"] > 0 for s in stats)
    assert all(isinstance(s["edges"], int) for s in stats)
    assert stats[-1]["probed"] is True  # converged via the gated probe
    # a fresh call replaces the sink (last call wins)
    clustering.connected_components(
        spark.createDataFrame([(1, 2)], "src long, dst long")
    ).count()
    assert clustering.LAST_RUN_ROUND_STATS is not stats


def test_self_loop_only_nodes_label_as_singletons(spark):
    """r10: singleton recovery switched from an all-nodes anti-join to
    the self-loop-only set — nodes whose EVERY edge is a self-loop must
    still come back as their own component, nodes with both a self-loop
    and a real edge must not be double-labeled, and a pure
    no-self-loop input must cover every node (the empty-selfs fast
    path)."""
    from pyspark_entity_resolution_spark.operators.clustering import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (900, 900), (900, 900), (901, 901), (3, 3)],
        ["src", "dst"],
    )
    got = {(r.node, r.component)
           for r in connected_components(edges).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (900, 900), (901, 901)}
    # empty-selfs fast path: all nodes labeled, no singleton branch
    edges2 = spark.createDataFrame([(1, 2), (4, 5)], ["src", "dst"])
    got2 = {(r.node, r.component)
            for r in connected_components(edges2).collect()}
    assert got2 == {(1, 1), (2, 1), (4, 4), (5, 4)}


def test_round1_small_only_knob_matches_default(spark, monkeypatch):
    """SPARK_GRAFT_CC_ROUND1=small-only (r11 experiment knob, measured-
    and-rejected as default) runs the first round as small-star alone.
    Labels must be identical: every star application preserves the
    component partition and only the fixed-point probe declares
    convergence, so the knob can cost rounds, never correctness."""
    import random

    rng = random.Random(123)
    n_nodes, n_edges = 400, 900
    raw = [
        (rng.randrange(n_nodes), rng.randrange(n_nodes))
        for _ in range(n_edges)
    ] + [(3, 3), (8, 8), (11, 30), (11, 30)]
    edges = spark.createDataFrame(raw, ["src", "dst"])

    monkeypatch.delenv("SPARK_GRAFT_CC_ROUND1", raising=False)
    baseline = _components_as_partitions(connected_components(edges).collect())
    monkeypatch.setenv("SPARK_GRAFT_CC_ROUND1", "small-only")
    skipped = _components_as_partitions(connected_components(edges).collect())
    assert skipped == baseline


def test_ingest_knob_fused_matches_staged(spark, monkeypatch):
    """SPARK_GRAFT_CC_INGEST selects whether round 1 consumes the raw
    filtered edge plan directly (``fused``, the r12 default — no
    pre-loop distinct/checkpoint/count of the largest edge set the loop
    ever sees) or the r11 staged distinct checkpoint. Labels must be
    identical: both star forms compute duplicate-insensitive
    per-neighborhood minima and the round-final dedup absorbs input
    multiplicity, so the knob can only move WHERE the dedup happens."""
    import random

    rng = random.Random(7)
    raw = [
        (rng.randrange(300), rng.randrange(300)) for _ in range(700)
    ] + [(5, 5), (5, 5), (950, 950), (17, 44), (17, 44), (17, 44)]
    edges = spark.createDataFrame(raw, ["src", "dst"])

    monkeypatch.setenv("SPARK_GRAFT_CC_INGEST", "staged")
    staged = sorted(
        (r.node, r.component) for r in connected_components(edges).collect()
    )
    monkeypatch.setenv("SPARK_GRAFT_CC_INGEST", "fused")
    fused = sorted(
        (r.node, r.component) for r in connected_components(edges).collect()
    )
    assert fused == staged


def test_ingest_knob_rejects_typos(spark, monkeypatch):
    import pytest

    monkeypatch.setenv("SPARK_GRAFT_CC_INGEST", "Fused ")
    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with pytest.raises(ValueError, match="SPARK_GRAFT_CC_INGEST"):
        connected_components(edges).collect()
