"""MinHash-LSH recall vs brute-force ground truth — the property that
justifies the banding (and pins the double-hashed permutation family as
a valid MinHash family, not just oracle-consistent)."""

import pytest
from pyspark.sql import functions as F

from pyspark_entity_resolution_spark.functions.text import tokens
from pyspark_entity_resolution_spark.operators.dedup import (
    minhash_lsh_candidates,
    minhash_lsh_dedup,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")


@pytest.fixture(scope="module")
def exact_pairs(spark, docs):
    """Brute-force all-pairs token Jaccard (500 docs -> 125k pairs)."""
    toks = F.array_distinct(tokens(F.col("text")))
    base = docs.select(F.col("doc_id"), toks.alias("tk"), F.size(toks).alias("nt"))
    a = base.select(F.col("doc_id").alias("a_id"), F.col("tk").alias("a_tk"),
                    F.col("nt").alias("a_nt"))
    b = base.select(F.col("doc_id").alias("b_id"), F.col("tk").alias("b_tk"),
                    F.col("nt").alias("b_nt"))
    inter = F.size(F.array_intersect("a_tk", "b_tk"))
    jac = F.try_divide(inter.cast("double"), F.col("a_nt") + F.col("b_nt") - inter)
    return {
        (r["a_id"], r["b_id"]): r["jac"]
        for r in a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("jac", jac)
        .filter(F.col("jac") >= 0.5)
        .collect()
    }


def test_lsh_recall_on_strong_near_dups(spark, docs, exact_pairs):
    """Pairs with jaccard >= 0.8 collide in a band with probability
    ~1-(1-0.8^4)^3 ~ 0.93 under the 12/3x4 scheme — require >= 0.85
    measured recall (the fixture's near-dups are mostly far above 0.8,
    where the curve saturates)."""
    strong = {p for p, j in exact_pairs.items() if j >= 0.8}
    assert len(strong) > 50  # fixture genuinely tests the property
    cands = {
        (r["a_id"], r["b_id"])
        for r in minhash_lsh_candidates(docs).collect()
    }
    recall = len(strong & cands) / len(strong)
    assert recall >= 0.85, f"recall={recall:.3f} on {len(strong)} strong pairs"


def test_verified_output_is_exact_subset(spark, docs, exact_pairs):
    """Verification guarantees precision = 1.0 against ground truth: every
    emitted pair really has jaccard >= 0.5, with the exact value."""
    out = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in minhash_lsh_dedup(docs, threshold=0.5).collect()
    }
    assert out  # nonempty
    for pair, jac in out.items():
        assert pair in exact_pairs
        assert abs(jac - exact_pairs[pair]) < 1e-9


def test_candidate_admission_is_exactly_once(spark, docs):
    # the scalar-unrolled first-colliding-band admission must emit every
    # colliding pair exactly once — a duplicate would double-count rows
    # downstream (no dedup pass exists by design)
    from pyspark.sql import functions as F

    cands = minhash_lsh_candidates(docs)
    dupes = (cands.groupBy("a_id", "b_id").count()
             .filter(F.col("count") > 1).count())
    assert dupes == 0
    assert cands.count() > 0


def test_embedding_lsh_admission_is_exactly_once(spark):
    import random

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from pyspark_entity_resolution_spark.operators.ann import (
        embedding_near_duplicates_lsh)

    rng = random.Random(11)
    rows = []
    vid = 0
    for _ in range(40):  # clusters of near-identical vectors -> pairs
        center = [rng.uniform(-1, 1) for _ in range(64)]
        for _ in range(rng.randint(1, 4)):
            rows.append((vid, [float(c + rng.uniform(-0.01, 0.01))
                               for c in center]))
            vid += 1
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])
    df = spark.createDataFrame(rows, schema)
    got = embedding_near_duplicates_lsh(df, threshold=0.99, num_tables=4)
    dupes = (got.groupBy("a_id", "b_id").count()
             .filter(F.col("count") > 1).count())
    assert dupes == 0
    assert got.count() > 0
