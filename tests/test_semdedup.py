"""SemDedup + unblocked LSH embedding near-dup tests.

Recall is measured against a brute-force all-pairs ground truth on the
real sf0.001 embeddings; SemDedup semantics are pinned on synthetic
vectors with planted duplicate chains.
"""

import math

import pytest
from pyspark.sql import functions as F

from pyspark_entity_resolution_spark.operators.ann import (
    embedding_near_duplicates_lsh,
)
from pyspark_entity_resolution_spark.operators.semdedup import (
    semdedup,
    semdedup_pairs,
)

SF_DIR = "/root/testdata/sf0.001"
THRESHOLD = 0.3


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").localCheckpoint()


@pytest.fixture(scope="module")
def true_pairs(embeddings):
    """Brute-force all-pairs cosine >= THRESHOLD (the ground truth)."""
    import numpy as np

    rows = embeddings.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    m = np.array([r.embedding for r in rows], dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if sims[i, j] >= THRESHOLD:
                a, b = int(ids[i]), int(ids[j])
                out.add((min(a, b), max(a, b)))
    return out


def test_lsh_near_dup_recall_and_precision(embeddings, true_pairs):
    assert len(true_pairs) > 10  # the fixture must carry real signal
    got = {
        (r.a_id, r.b_id)
        for r in embedding_near_duplicates_lsh(
            embeddings, threshold=THRESHOLD, num_planes=4, num_tables=8
        ).collect()
    }
    # precision exactly 1.0: every emitted pair passed the exact verify
    assert got <= true_pairs
    recall = len(got & true_pairs) / len(true_pairs)
    assert recall >= 0.5, f"recall {recall:.3f}"


def test_lsh_more_tables_more_recall(embeddings, true_pairs):
    def recall(tables):
        got = {
            (r.a_id, r.b_id)
            for r in embedding_near_duplicates_lsh(
                embeddings, threshold=THRESHOLD, num_planes=4, num_tables=tables
            ).collect()
        }
        return len(got & true_pairs) / len(true_pairs)

    assert recall(8) >= recall(1)


def test_lsh_pairs_exactly_once(embeddings):
    df = embedding_near_duplicates_lsh(
        embeddings, threshold=THRESHOLD, num_planes=4, num_tables=8
    )
    assert df.count() == df.select("a_id", "b_id").distinct().count()


def _planted(spark):
    """3 well-separated directions; direction 0 carries a near-dup CHAIN
    a~b~c (a·c below threshold-by-pair but joined through b), direction 1
    a single near-dup pair, direction 2 a lone vector."""
    base = {
        0: [1.0, 0.0, 0.0, 0.0],
        1: [0.0, 1.0, 0.0, 0.0],
        2: [0.0, 0.0, 1.0, 0.0],
    }

    def tilt(d, eps):
        v = list(base[d])
        v[3] = eps
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    rows = [
        (0, tilt(0, 0.0)),
        (1, tilt(0, 0.30)),  # cos(0,1)~0.958, cos(1,2)~0.988, cos(0,2)~0.905
        (2, tilt(0, 0.45)),
        (10, tilt(1, 0.0)),
        (11, tilt(1, 0.2)),  # cos~0.980
        (20, tilt(2, 0.0)),
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_semdedup_collapses_chains_transitively(spark):
    df = _planted(spark)
    kept = sorted(
        r.vec_id
        for r in semdedup(df, k=3, threshold=0.95, max_iterations=2).collect()
    )
    # chain 0~1~2 -> keep 0 (0~2 at cos .905 were never a direct pair);
    # pair 10~11 -> keep 10; singleton 20 survives
    assert kept == [0, 10, 20]


def test_semdedup_pairs_stay_within_clusters(spark):
    df = _planted(spark)
    pairs = {
        (r.a_id, r.b_id)
        for r in semdedup_pairs(df, k=3, threshold=0.95, max_iterations=2).collect()
    }
    # cross-direction pairs (cos ~0) must never appear
    assert pairs == {(0, 1), (1, 2), (10, 11)}


def test_semdedup_noop_on_distinct_corpus(spark):
    df = _planted(spark).filter(F.col("vec_id").isin(0, 10, 20))
    assert semdedup(df, k=3, threshold=0.95, max_iterations=2).count() == 3
