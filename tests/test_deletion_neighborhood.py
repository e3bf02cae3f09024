"""Deletion-neighborhood edit-distance-1 pair tests (operators/matching.py).

The brute-force oracle is the blocked all-pairs bounded levenshtein —
the exact formulation the operator replaces.
"""

import pytest
from pyspark.sql import functions as F

from pyspark_entity_resolution_spark.operators.matching import (
    deletion_neighborhood_pairs,
)


def _df(spark, rows, with_block=False):
    schema = "id long, s string" + (", blk string" if with_block else "")
    return spark.createDataFrame(rows, schema)


def _brute(spark, df, block=None):
    a = df.select(F.col("id").alias("u"), F.col("s").alias("a_s"),
                  *([F.col("blk")] if block else []))
    b = df.select(F.col("id").alias("v"), F.col("s").alias("b_s"),
                  *([F.col("blk")] if block else []))
    j = a.join(b, on="blk") if block else a.crossJoin(b)
    return {
        (r.u, r.v)
        for r in j.filter(
            (F.col("u") < F.col("v")) & (F.levenshtein("a_s", "b_s", 1) >= 0)
        ).collect()
    }


CASES = [
    (0, "abcdef"),
    (1, "abcdef"),   # identical -> distance 0
    (2, "abXdef"),   # substitution of 0
    (3, "abcdeff"),  # insertion vs 0
    (4, "abcde"),    # deletion vs 0
    (5, "ba"),       # 'ab'-transposition family: distance 2 from 'ab'
    (6, "ab"),
    (7, "aaab"),     # char-run: multiple deletions coincide
    (8, "aab"),      # distance 1 from 'aaab' via run deletion
    (9, "zzzzzz"),
    (10, ""),        # empty string: variants = [''] only
    (11, "a"),       # distance 1 from ''
]


def test_matches_brute_force_on_adversarial_strings(spark):
    df = _df(spark, CASES)
    got = {
        (r.a_id, r.b_id)
        for r in deletion_neighborhood_pairs(df, "id", "s").collect()
    }
    assert got == _brute(spark, df)


def test_exactly_once_even_for_identical_strings(spark):
    # identical strings share EVERY variant; run-deletions coincide —
    # both must still emit a single row per pair
    df = _df(spark, [(0, "aaaa"), (1, "aaaa"), (2, "aaa")])
    out = deletion_neighborhood_pairs(df, "id", "s")
    rows = out.collect()
    assert len(rows) == out.select("a_id", "b_id").distinct().count() == 3


def test_blocking_column_restricts_pairs(spark):
    df = _df(
        spark,
        [(0, "same", "x"), (1, "same", "x"), (2, "same", "y")],
        with_block=True,
    )
    got = {
        (r.a_id, r.b_id)
        for r in deletion_neighborhood_pairs(
            df, "id", "s", block_cols=["blk"]
        ).collect()
    }
    assert got == {(0, 1)}  # cross-block identical strings never pair


def test_distance_two_collisions_are_verified_away(spark):
    # 'ab' vs 'ba' share deletion variants 'a' and 'b' but sit at
    # distance 2 — the bounded-levenshtein verify must drop them
    df = _df(spark, [(5, "ba"), (6, "ab")])
    assert deletion_neighborhood_pairs(df, "id", "s").count() == 0


def test_customer_names_equivalence(spark):
    c = (
        spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
        .select(
            F.col("c_custkey").alias("id"),
            F.col("c_name").alias("s"),
            F.col("c_nationkey").cast("string").alias("blk"),
        )
    )
    got = {
        (r.a_id, r.b_id)
        for r in deletion_neighborhood_pairs(
            c, "id", "s", block_cols=["blk"]
        ).collect()
    }
    assert got == _brute(spark, c, block=True)
    assert len(got) > 0  # fixture must carry signal


def test_randomized_equivalence_small_alphabet(spark):
    """Seeded random corpora over a 2-letter alphabet maximize collision
    pathology (runs, shifts, shared variants at distance 2); the pair
    set must equal brute force on every batch."""
    import random

    for seed in range(5):
        rng = random.Random(seed)
        rows = [
            (i, "".join(rng.choice("ab") for _ in range(rng.randint(0, 6))))
            for i in range(40)
        ]
        df = _df(spark, rows)
        got = {
            (r.a_id, r.b_id)
            for r in deletion_neighborhood_pairs(df, "id", "s").collect()
        }
        assert got == _brute(spark, df), f"seed {seed}"
        # exactly-once under heavy variant sharing
        out = deletion_neighborhood_pairs(df, "id", "s")
        assert out.count() == out.distinct().count()
