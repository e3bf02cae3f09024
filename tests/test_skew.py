"""Salted-join correctness: result set identical to the plain join."""

from pyspark.sql import functions as F

from pyspark_entity_resolution_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join(spark):
    # heavily skewed left: 90% of rows share key 'hot'
    left = spark.createDataFrame(
        [("hot" if i % 10 else f"k{i}", i) for i in range(1000)], ["k", "v"]
    )
    right = spark.createDataFrame(
        [("hot", "H"), ("k10", "A"), ("k20", "B"), ("missing", "Z")], ["k", "tag"]
    )
    plain = {(r["k"], r["v"], r["tag"]) for r in left.join(right, on="k").collect()}
    salted = {
        (r["k"], r["v"], r["tag"])
        for r in salted_join(left, right, on=["k"], num_salts=8).collect()
    }
    assert salted == plain
    assert len(plain) == 902  # 900 hot + 2 singles


def test_salted_left_join(spark):
    left = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"])
    right = spark.createDataFrame([("a", "X")], ["k", "tag"])
    rows = {
        (r["k"], r["tag"])
        for r in salted_join(left, right, on=["k"], num_salts=4, how="left").collect()
    }
    assert rows == {("a", "X"), ("b", None)}


def test_salt_is_deterministic(spark):
    from pyspark_entity_resolution_spark.operators.skew import with_salt

    df = spark.createDataFrame([(i,) for i in range(100)], ["x"])
    s1 = [r["__salt"] for r in with_salt(df, 16).orderBy("x").collect()]
    s2 = [r["__salt"] for r in with_salt(df, 16).orderBy("x").collect()]
    assert s1 == s2
    assert len(set(s1)) > 4  # actually spreads
