"""r11: the vector/bucket/centroid expression builders moved from
composed-Column construction (per-element ``F.lit`` + lambda handshakes,
~60 py4j round-trips per cosine) to single ``F.expr`` SQL parses. These
tests pin that the parsed SQL computes BIT-IDENTICAL values to the old
composed form (kept verbatim here as the reference), on vectors that
exercise negatives, zeros, exact dyadic fractions, and non-dyadic
decimals whose double representation must round-trip through repr().
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pyspark_entity_resolution_spark.functions.vectors import (
    as_double,
    dot,
    l2_norm,
    paired_cosine,
)
from pyspark_entity_resolution_spark.operators.ann import _bucket_expr, hyperplanes
from pyspark_entity_resolution_spark.operators.kmeans import _sq_dist as km_sq_dist
from pyspark_entity_resolution_spark.operators.pq import _sq_dist as pq_sq_dist

DIM = 8
VECS = [
    (1, [0.1, -0.2, 0.3, 0.0, 1.5, -2.25, 0.7071067811865476, 1e-3]),
    (2, [-1.0, 2.0, -3.0, 4.0, -5.0, 6.0, -7.0, 8.0]),
    (3, [0.0] * 8),
    (4, [1.0 / 3.0, 2.0 / 3.0, -1.0 / 7.0, 0.125, -0.375, 9.99, -9.99, 0.001]),
]


@pytest.fixture(scope="module")
def vec_df(spark):
    return spark.createDataFrame(
        [(i, v, v[::-1]) for i, v in VECS], "id int, a array<double>, b array<double>"
    )


def _old_fold_sum(arr):
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def _old_as_double(v):
    return F.transform(F.col(v) if isinstance(v, str) else v, lambda x: x.cast("double"))


def _old_dot(a, b):
    return _old_fold_sum(
        F.zip_with(_old_as_double(a), _old_as_double(b), lambda x, y: x * y)
    )


def _old_l2_norm(v):
    return F.sqrt(_old_fold_sum(F.transform(_old_as_double(v), lambda x: x * x)))


def _collect(df, col):
    return [r[0] for r in df.select(col.alias("v")).orderBy("id").collect()]


def _assert_bitwise_equal(xs, ys):
    assert len(xs) == len(ys)
    for x, y in zip(xs, ys):
        if x is None or y is None:
            assert x is None and y is None
        else:
            # bit-identical doubles, not approx-equal
            assert math.isnan(x) and math.isnan(y) or x == y, (x, y)


def test_dot_sql_equals_composed(vec_df):
    df = vec_df.select("id", dot("a", "b").alias("n"), _old_dot("a", "b").alias("o"))
    rows = df.collect()
    _assert_bitwise_equal([r["n"] for r in rows], [r["o"] for r in rows])


def test_l2_norm_sql_equals_composed(vec_df):
    rows = vec_df.select(
        "id", l2_norm("a").alias("n"), _old_l2_norm("a").alias("o")
    ).collect()
    _assert_bitwise_equal([r["n"] for r in rows], [r["o"] for r in rows])


def test_as_double_sql_equals_composed(vec_df):
    rows = vec_df.select(
        "id", as_double("a").alias("n"), _old_as_double("a").alias("o")
    ).collect()
    for r in rows:
        assert r["n"] == r["o"]


def test_paired_cosine_sql_equals_composed(vec_df):
    sides = vec_df.select(
        "id", "a", "b", l2_norm("a").alias("na"), l2_norm("b").alias("nb")
    )
    old = F.try_divide(_old_dot("a", "b"), F.col("na") * F.col("nb"))
    rows = sides.select(
        "id", paired_cosine("a", "b", "na", "nb").alias("n"), old.alias("o")
    ).collect()
    # zero-norm row (id=3) must be NULL on both paths
    _assert_bitwise_equal([r["n"] for r in rows], [r["o"] for r in rows])


def test_bucket_expr_sql_equals_composed(vec_df):
    planes = hyperplanes(4, DIM)
    old_bits = [
        F.when(
            F.aggregate(
                F.zip_with(_old_as_double("a"), F.lit(p), lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for p in planes
    ]
    rows = vec_df.select(
        "id", _bucket_expr("a", planes).alias("n"), F.concat(*old_bits).alias("o")
    ).collect()
    assert all(r["n"] == r["o"] for r in rows)
    assert all(len(r["n"]) == 4 and set(r["n"]) <= {"0", "1"} for r in rows)


def test_pq_sq_dist_sql_equals_composed(vec_df):
    cent = [0.5, -0.25, 1.0 / 3.0, 0.0, 2.5, -1e-3, 7.25, -8.125]
    old = F.aggregate(
        F.zip_with(F.col("a"), F.lit(cent), lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    rows = vec_df.select(
        "id", pq_sq_dist("`a`", cent).alias("n"), old.alias("o")
    ).collect()
    _assert_bitwise_equal([r["n"] for r in rows], [r["o"] for r in rows])
    # the sliced form used by pq_train/pq_assign
    old_sl = F.aggregate(
        F.zip_with(F.slice("a", 1, 4), F.lit(cent[:4]), lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    rows = vec_df.select(
        "id", pq_sq_dist("slice(`a`, 1, 4)", cent[:4]).alias("n"), old_sl.alias("o")
    ).collect()
    _assert_bitwise_equal([r["n"] for r in rows], [r["o"] for r in rows])


def test_kmeans_sq_dist_sql_equals_composed(vec_df):
    cent = [1.0, -2.0, 0.3333333333333333, 0.0, -0.125, 4.75, 1e-3, -9.0]
    old = F.aggregate(
        F.zip_with(
            _old_as_double("a"), F.lit(cent), lambda x, c: (x - c) * (x - c)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    rows = vec_df.select(
        "id", km_sq_dist("`a`", cent).alias("n"), old.alias("o")
    ).collect()
    _assert_bitwise_equal([r["n"] for r in rows], [r["o"] for r in rows])


def test_repr_double_roundtrip_through_sql_parser(spark):
    """The SQL path embeds centroids via repr(); Spark's parser must
    recover the exact same double for adversarial values."""
    vals = [1e-308, 1.7976931348623157e308, 0.1 + 0.2, -2.2250738585072014e-308,
            123456789.123456789, 3.141592653589793]
    sql = "select array(" + ", ".join(f"{v!r}D" for v in vals) + ") as a"
    got = spark.sql(sql).collect()[0]["a"]
    assert got == vals
    assert [g.hex() for g in got] == [v.hex() for v in vals]
