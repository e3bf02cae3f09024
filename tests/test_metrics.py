"""P/R/F1 harness (reference src/performance.py semantics, single-join
implementation) including the zero-denominator edges."""

from pyspark_entity_resolution_spark.operators.metrics import match_quality


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "a_id long, b_id long")


def test_perfect_match(spark):
    full = _pairs(spark, [(1, 10), (2, 20), (3, 30)])
    m = match_quality(full, full)
    assert (m["precision"], m["recall"], m["f1"]) == (1.0, 1.0, 1.0)
    assert m["true positives"] == 3 and m["false negatives"] == 0


def test_partial_recall_and_precision(spark):
    full = _pairs(spark, [(1, 10), (2, 20), (3, 30), (4, 40)])
    blocked = _pairs(spark, [(1, 10), (2, 20), (9, 90)])  # 2 tp, 1 fp, 2 fn
    m = match_quality(full, blocked)
    assert m["true positives"] == 2
    assert m["false positives"] == 1
    assert m["false negatives"] == 2
    assert m["precision"] == round(2 / 3, 3)
    assert m["recall"] == 0.5
    f1 = 2 * (2 / 3) * 0.5 / ((2 / 3) + 0.5)
    assert m["f1"] == round(f1, 3)


def test_empty_blocked_does_not_divide_by_zero(spark):
    full = _pairs(spark, [(1, 10)])
    empty = _pairs(spark, [])
    m = match_quality(full, empty)
    assert m["precision"] == 0.0 and m["recall"] == 0.0 and m["f1"] == 0.0


def test_both_empty(spark):
    empty = _pairs(spark, [])
    m = match_quality(empty, empty)
    assert m["f1"] == 0.0 and m["true duplicates"] == 0
