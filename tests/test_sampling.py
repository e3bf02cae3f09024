"""Deterministic sampling + source mixing operators."""

import pytest
from pyspark.sql import functions as F

from pyspark_entity_resolution_spark.operators.sampling import (
    hash_sample,
    mix_sources,
    stratified_hash_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    # 3 sources with very different sizes: 600 web, 300 books, 100 code
    return spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 600, "web")
        .when(F.col("id") < 900, "books")
        .otherwise("code")
        .alias("source"),
    )


def test_hash_sample_rate_and_determinism(spark, docs):
    s1 = hash_sample(docs, "doc_id", 0.2)
    s2 = hash_sample(docs, "doc_id", 0.2)
    ids1 = {r["doc_id"] for r in s1.collect()}
    ids2 = {r["doc_id"] for r in s2.collect()}
    assert ids1 == ids2                      # same rows every run
    assert 0.1 < len(ids1) / 1000 < 0.3      # ~20%
    # different seed -> a different (but still deterministic) subset
    ids3 = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.2, seed="b").collect()}
    assert ids3 != ids1
    # rate monotonicity: a 10% sample is a subset of the 20% sample
    ids_small = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.1).collect()}
    assert ids_small <= ids1


def test_stratified_rates_apply_per_stratum(spark, docs):
    out = stratified_hash_sample(
        docs, "doc_id", "source",
        rates={"web": 0.1, "books": 0.5}, default_rate=1.0,
    )
    got = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert 20 <= got["web"] <= 100          # ~10% of 600
    assert 100 <= got["books"] <= 200       # ~50% of 300
    assert got["code"] == 100               # default 1.0 keeps all


def test_mix_sources_hits_target_composition(spark, docs):
    # target 1:1 web:books, drop code. books (300) binds -> ~300 web kept.
    mixed = mix_sources(docs, "doc_id", "source", {"web": 0.5, "books": 0.5})
    got = {
        r["source"]: r["n"]
        for r in mixed.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert "code" not in got
    assert got["books"] == 300              # binding source kept whole
    assert 240 <= got["web"] <= 360         # hash-sampled to ~300


def test_mix_sources_weights_beyond_data(spark, docs):
    # code only has 100 rows but wants 80% weight -> code binds, kept
    # whole; web sampled to ~25 (100/0.8*0.2)
    mixed = mix_sources(docs, "doc_id", "source", {"code": 0.8, "web": 0.2})
    got = {
        r["source"]: r["n"]
        for r in mixed.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got["code"] == 100
    assert 10 <= got["web"] <= 45


def test_mix_sources_empty_and_missing(spark, docs):
    empty = mix_sources(docs.filter(F.lit(False)), "doc_id", "source", {"web": 1.0})
    assert empty.count() == 0
    none_present = mix_sources(docs, "doc_id", "source", {"nonexistent": 1.0})
    assert none_present.count() == 0


def test_mix_sources_zero_weight_source_dropped(spark, docs):
    # a 0-weight entry must drop its source (not divide by zero in the
    # t_max computation, not bind the mix)
    mixed = mix_sources(docs, "doc_id", "source", {"web": 1.0, "books": 0.0})
    got = {r["source"] for r in mixed.select("source").distinct().collect()}
    assert got == {"web"}


def test_mix_sources_tiny_rate_quantization_guard(spark):
    # adversarial quantization case: source b is owed ~1.2 rows out of
    # 1.5M, so its rate (8e-7) is BELOW the 1/HASH_BUCKETS resolution and
    # the floored threshold would be 0 buckets — silently erasing a
    # positive-share source. The clamp keeps the smallest expressible
    # share (1 bucket ~ 1.5 expected rows here) instead of zero.
    big = spark.range(1_500_000).select(
        F.col("id").alias("doc_id"), F.lit("b").alias("source")
    )
    small = spark.range(2_000_000, 2_001_199).select(
        F.col("id").alias("doc_id"), F.lit("a").alias("source")
    )
    df = big.unionByName(small)
    mixed = mix_sources(df, "doc_id", "source", {"a": 0.999, "b": 0.001})
    got = {
        r["source"]: r["n"]
        for r in mixed.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got["a"] == 1199                  # binding source kept whole
    assert got.get("b", 0) >= 1              # not silently erased
    assert got["b"] <= 10                    # still a tiny share, not a flood
