"""k-means operator: determinism, objective decrease, sane clustering."""

import pytest
from pyspark.sql import functions as F

from pyspark_entity_resolution_spark.operators.kmeans import inertia, kmeans


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


def test_kmeans_deterministic(spark, embeddings):
    a1 = {(r["vec_id"], r["cluster"]) for r in kmeans(embeddings, k=4, max_iterations=3).collect()}
    a2 = {(r["vec_id"], r["cluster"]) for r in kmeans(embeddings, k=4, max_iterations=3).collect()}
    assert a1 == a2
    assert len(a1) == embeddings.count()


def test_kmeans_objective_decreases(spark, embeddings):
    i1 = inertia(kmeans(embeddings, k=4, max_iterations=1))
    i3 = inertia(kmeans(embeddings, k=4, max_iterations=3))
    assert i3 <= i1 + 1e-6


def test_kmeans_uses_all_clusters_on_separated_data(spark):
    # two obvious blobs in 4-d
    rows = [(i, [10.0, 10.0, 10.0, 10.0]) for i in range(20)] + [
        (100 + i, [-10.0, -10.0, -10.0, -10.0]) for i in range(20)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = kmeans(df, k=2, max_iterations=4).collect()
    by_cluster = {}
    for r in got:
        by_cluster.setdefault(r["cluster"], set()).add(r["vec_id"])
    assert len(by_cluster) == 2
    sizes = sorted(len(v) for v in by_cluster.values())
    assert sizes == [20, 20]


def test_kmeans_refuses_ragged_embeddings(spark):
    """The r11 column-aggregate mean requires fixed-dim vectors; ragged
    corpora must fail loudly instead of silently averaging per-dim (the
    old posexplode shape's behavior)."""
    rows = [(1, [1.0, 2.0]), (2, [3.0, 4.0]), (3, [5.0, 6.0, 7.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    with pytest.raises(Exception, match="fixed-dimension"):
        kmeans(df, k=2, max_iterations=1, quantize=6).collect()


def test_kmeans_mean_is_sum_over_row_count(spark):
    """r12 (ADVICE r11): pin the centroid mean arithmetic — sum of each
    dim over the cluster's ROW count (the pre-r11 posexplode denominator,
    count(lit(1))). k=1 with 2 iterations converges on the true mean, and
    the returned sq_dist is the squared distance to that mean, so the
    denominator is directly observable in the output."""
    rows = [(1, [0.0]), (2, [3.0]), (3, [12.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {r["vec_id"]: r["sq_dist"] for r in kmeans(
        df, k=1, max_iterations=3, quantize=0
    ).collect()}
    # mean = (0 + 3 + 12) / 3 = 5.0 -> sq_dists 25, 4, 49
    assert got == {1: 25.0, 2: 4.0, 3: 49.0}
