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
