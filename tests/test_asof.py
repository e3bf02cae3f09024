"""As-of join operator semantics (most-recent-prior, <= ties, left-join
NULLs)."""

from datetime import datetime

from pyspark_entity_resolution_spark.operators.asof import as_of_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "L1"),
            (1, _ts("2024-01-01 12:00:00"), "L2"),
            (1, _ts("2024-01-01 09:00:00"), "L0"),  # before any right row
            (2, _ts("2024-01-01 10:30:00"), "L3"),  # key with no right rows
        ],
        ["k", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), "R1"),
            (1, _ts("2024-01-01 10:00:00"), "R2"),  # exact tie with L1 -> matches
            (1, _ts("2024-01-01 11:59:00"), "R3"),
        ],
        ["k", "ts", "val"],
    )
    rows = {
        r["tag"]: r["val_right"]
        for r in as_of_join(left, right, on=["k"]).collect()
    }
    assert rows == {
        "L0": None,   # no right row at or before 09:00
        "L1": "R2",   # exact-timestamp match wins (<= semantics)
        "L2": "R3",
        "L3": None,   # key 2 has no right rows
    }


def test_asof_multiple_keys_and_columns(spark):
    left = spark.createDataFrame(
        [("a", 1, _ts("2024-01-02 00:00:00"))], ["g", "sub", "ts"]
    )
    right = spark.createDataFrame(
        [
            ("a", 1, _ts("2024-01-01 00:00:00"), 10, "x"),
            ("a", 2, _ts("2024-01-01 12:00:00"), 20, "y"),  # different sub-key
        ],
        ["g", "sub", "ts", "num", "txt"],
    )
    row = as_of_join(left, right, on=["g", "sub"]).collect()[0]
    assert row["num_right"] == 10 and row["txt_right"] == "x"
    assert row["ts_right"] == _ts("2024-01-01 00:00:00")
