"""Property tests: token_jaccard vs Python set-Jaccard, vector ops vs
numpy, on randomized inputs (batched through Spark in one pass)."""

import math
import re

import numpy as np
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from pyspark_entity_resolution_spark.functions.similarity import token_jaccard
from pyspark_entity_resolution_spark.functions.vectors import cosine, dot, l2_norm

words = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "x", "yy", "zzz", "42"]),
    min_size=1,
    max_size=8,
)


@settings(max_examples=6, deadline=None)
@given(st.lists(st.tuples(words, words), min_size=1, max_size=20))
def test_token_jaccard_matches_python_sets(spark, pairs):
    rows = [(" ".join(a), " ".join(b)) for a, b in pairs]
    df = spark.createDataFrame(rows, ["a", "b"])
    got = df.select("a", "b", token_jaccard("a", "b").alias("j")).collect()
    for r in got:
        sa = set(re.split(r"\s+", r["a"]))
        sb = set(re.split(r"\s+", r["b"]))
        expected = len(sa & sb) / len(sa | sb)
        assert abs(r["j"] - expected) < 1e-12, (r["a"], r["b"])


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.lists(st.floats(-10, 10, allow_nan=False, width=32), min_size=4, max_size=4),
            st.lists(st.floats(-10, 10, allow_nan=False, width=32), min_size=4, max_size=4),
        ),
        min_size=1,
        max_size=15,
    )
)
def test_vector_ops_match_numpy(spark, pairs):
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)], ["i", "a", "b"]
    )
    got = df.select(
        "i",
        dot("a", "b").alias("dot"),
        l2_norm("a").alias("na"),
        cosine("a", "b").alias("cos"),
    ).collect()
    for r in got:
        a = np.array(pairs[r["i"]][0], dtype=np.float32).astype(np.float64)
        b = np.array(pairs[r["i"]][1], dtype=np.float32).astype(np.float64)
        assert abs(r["dot"] - float(np.dot(a, b))) < 1e-9
        assert abs(r["na"] - float(np.linalg.norm(a))) < 1e-9
        na, nb = float(np.linalg.norm(a)), float(np.linalg.norm(b))
        if na > 0 and nb > 0:
            assert abs(r["cos"] - float(np.dot(a, b)) / (na * nb)) < 1e-9
        else:
            assert r["cos"] is None or math.isnan(r["cos"]) or math.isinf(r["cos"])
