"""ANN recall measurement against the exact baseline — the property that
justifies an approximate operator (the reference quantifies its blocking
recall the same way, report.pdf Table 1).

Everything here is deterministic (md5-derived hyperplanes, fixed data),
so the measured recalls are exact numbers and the thresholds are pinned
just below them. The sf0.1 embeddings are weakly-clustered synthetic
vectors, so absolute recall is modest; the assertions pin the dials that
matter: multi-probe > single-bucket, more tables > fewer tables, and the
candidate set stays a strict subset of the brute-force scan.
"""

import pytest
from pyspark.sql import functions as F

from pyspark_entity_resolution_spark.operators import ann as A

SF_DIR = "/root/testdata/sf0.1"
K = 10


@pytest.fixture(scope="module")
def corpus(spark):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").repartition(8).cache()
    e.count()
    yield e
    e.unpersist()


@pytest.fixture(scope="module")
def queries(corpus):
    return corpus.filter(F.col("vec_id") < 20)


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


@pytest.fixture(scope="module")
def exact(queries, corpus):
    return _topk_sets(
        A.brute_force_topk(queries, corpus, k=K, broadcast_queries=True)
    )


def _recall(approx, exact):
    recs = [len(approx.get(q, set()) & s) / len(s) for q, s in exact.items()]
    return sum(recs) / len(recs)


def test_multiprobe_beats_single_bucket_lsh(spark, queries, corpus, exact):
    lsh = _recall(
        _topk_sets(A.lsh_topk(queries, corpus, k=K, num_planes=4)), exact
    )
    multi = _recall(
        _topk_sets(A.multiprobe_lsh_topk(queries, corpus, k=K, num_planes=4)),
        exact,
    )
    # measured on this fixed corpus: lsh=0.12, multiprobe=0.54
    assert lsh >= 0.10
    assert multi >= 0.50
    assert multi > lsh + 0.2  # probing Hamming-1 buckets must buy recall


def test_multi_table_lsh_recall_scales_with_tables(spark, queries, corpus, exact):
    r4 = _recall(
        _topk_sets(A.lsh_topk(queries, corpus, k=K, num_planes=4, num_tables=4)),
        exact,
    )
    r12 = _recall(
        _topk_sets(A.lsh_topk(queries, corpus, k=K, num_planes=4, num_tables=12)),
        exact,
    )
    # measured: L4=0.455, L12=0.84 — the recall/cost dial works
    assert r4 >= 0.40
    assert r12 >= 0.80
    assert r12 > r4


def test_ivf_recall_floor(spark, queries, corpus, exact):
    centroids = corpus.filter(
        (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 500)
    ).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    ivf = _recall(
        _topk_sets(A.ivf_topk(queries, corpus, centroids, k=K)), exact
    )
    assert ivf >= 0.20  # measured 0.235 at nprobe=1 on 10 coarse centroids

    ivf3 = _recall(
        _topk_sets(A.ivf_topk(queries, corpus, centroids, k=K, nprobe=3)),
        exact,
    )
    assert ivf3 >= 0.50  # probing 3 lists must clear half the exact set
    assert ivf3 > ivf + 0.1  # nprobe is a real recall dial, not noise


def test_choose_num_planes_scales_with_corpus():
    assert A.choose_num_planes(100) == 4
    assert A.choose_num_planes(10**6) == 10
    assert A.choose_num_planes(10**9) == 20  # 2^20 buckets ~ 1k occupancy


def test_brute_force_broadcast_guard(spark, queries, corpus, monkeypatch):
    # over-threshold query side must NOT carry the broadcast HINT — at
    # real scale that hint is a driver OOM; without it Catalyst/AQE stay
    # free to pick a partitioned join once statistics rule broadcast out.
    # (On this tiny corpus Catalyst still chooses BNLJ on its own, so the
    # assertion targets the hint in the analyzed plan, not the physical
    # operator.)
    monkeypatch.setattr(A, "MAX_BROADCAST_QUERY_ROWS", 5)
    guarded = A.brute_force_topk(queries, corpus, k=3)
    plan = guarded._jdf.queryExecution().analyzed().toString()
    assert "UnresolvedHint" not in plan and "ResolvedHint" not in plan

    forced = A.brute_force_topk(queries, corpus, k=3, broadcast_queries=True)
    plan2 = forced._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" in plan2

    # the degraded plan still computes the same result
    assert _topk_sets(guarded) == _topk_sets(forced)


def test_ivf_with_trained_centroids(spark, queries, corpus, exact):
    """Production IVF trains its coarse quantizer; compose kmeans ->
    ivf_topk and check the trained quantizer is at least competitive
    with the arbitrary fixed-row centroids at the same nprobe."""
    from pyspark_entity_resolution_spark.operators.kmeans import kmeans

    assign = kmeans(corpus, k=10, max_iterations=5)
    trained = (
        assign.filter(F.col("sq_dist").isNotNull())
        .groupBy("cluster")
        .agg(F.min("vec_id").alias("rep_id"))
        .join(corpus, F.col("rep_id") == F.col("vec_id"))
        .select(
            F.col("cluster").alias("centroid_id"),
            F.col("embedding").alias("centroid_vec"),
        )
    )
    fixed = corpus.filter(
        (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 500)
    ).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    r_trained = _recall(
        _topk_sets(A.ivf_topk(queries, corpus, trained, k=K, nprobe=3)), exact
    )
    r_fixed = _recall(
        _topk_sets(A.ivf_topk(queries, corpus, fixed, k=K, nprobe=3)), exact
    )
    assert r_trained >= 0.5  # absolute floor at nprobe=3
    assert r_trained >= r_fixed - 0.05  # trained quantizer competitive


def test_choose_num_planes_matches_oracle_scales():
    # the embedding_near_dup_lsh driver query runs ADAPTIVE planes while
    # its DuckDB oracle hardcodes 4-plane keys: parity requires
    # choose_num_planes == 4 at every gate scale (sf0.001/sf0.01 have
    # <= 500 vectors; 4 holds all the way to 16 * TARGET_BUCKET_SIZE)
    for n in (50, 500, 2000, 16 * A.TARGET_BUCKET_SIZE):
        assert A.choose_num_planes(n) == 4
    assert A.choose_num_planes(16 * A.TARGET_BUCKET_SIZE + 1) == 5
