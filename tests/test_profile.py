"""Dataset-profiling operators: exact profile vs hand-computed truth,
sketch profile within documented error bounds, heavy hitters vs exact
counts, and the one-scan plan shape."""

import math

import pytest
from pyspark.sql import functions as F

from pyspark_entity_resolution_spark.operators import profile as P


@pytest.fixture(scope="module")
def people(spark):
    rows = [
        (i, float(i % 7) if i % 11 else None, ["red", "green", "blue"][i % 3])
        for i in range(1, 201)
    ]
    return spark.createDataFrame(rows, "id bigint, score double, color string")


def _metric(rows, key, metric):
    for r in rows:
        if r.key == key and r.metric == metric:
            return r
    raise AssertionError(f"missing {key}/{metric}")


def test_profile_columns_exact(people):
    rows = P.profile_columns(people, ["id", "score", "color"]).collect()
    assert _metric(rows, "*", "n_rows").value_num == 200.0
    assert _metric(rows, "id", "n_null").value_num == 0.0
    assert _metric(rows, "id", "n_distinct").value_num == 200.0
    assert _metric(rows, "id", "min").value_num == 1.0
    assert _metric(rows, "id", "max").value_num == 200.0
    assert _metric(rows, "id", "avg").value_num == 100.5
    # 18 of 200 ids are multiples of 11
    assert _metric(rows, "score", "n_null").value_num == 18.0
    assert _metric(rows, "score", "n_distinct").value_num == 7.0
    scores = [float(i % 7) for i in range(1, 201) if i % 11]
    mean = sum(scores) / len(scores)
    assert _metric(rows, "score", "avg").value_num == round(mean, 4)
    sd = math.sqrt(
        sum((s - mean) ** 2 for s in scores) / (len(scores) - 1)
    )
    assert _metric(rows, "score", "stddev").value_num == pytest.approx(
        round(sd, 4), abs=1e-4
    )
    assert _metric(rows, "color", "min").value_str == "blue"
    assert _metric(rows, "color", "max").value_str == "red"
    assert _metric(rows, "color", "n_distinct").value_num == 3.0


def test_profile_single_scan(people):
    """The exact profile is ONE aggregate: a single scan of the input
    (Expand for multi-distinct is fine; a second scan is not)."""
    plan = P.profile_columns(people, ["id", "color"])._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1


def test_profile_columns_approx_bounds(people):
    rows = P.profile_columns_approx(
        people, ["id", "score"], rsd=0.05, percentiles=(0.5,)
    ).collect()
    nd = _metric(rows, "id", "approx_n_distinct").value_num
    # HLL++ at rsd=0.05: allow 4 sigma
    assert abs(nd - 200) <= 4 * 0.05 * 200
    assert _metric(rows, "id", "n_null").value_num == 0.0
    p50 = _metric(rows, "score", "approx_p50").value_num
    assert 2.0 <= p50 <= 4.0  # true median of 0..6-ish distribution
    assert _metric(rows, "score", "n_null").value_num == 18.0


def test_heavy_hitters_exact(people):
    top = P.heavy_hitters(people, "color", k=2).collect()
    # counts: green/blue 67 (tie), red 66 -> tie on 67 broken by value
    assert [(r.key, r.value_num) for r in top] == [
        ("blue", 67.0), ("green", 67.0),
    ]
    assert all(r.section == "topk" and r.metric == "count" for r in top)


def test_group_percentiles_long_format(people):
    g = P.group_percentiles(
        people.filter(F.col("score").isNotNull()), "color", "score",
        {"p50": 0.5, "p90": 0.9},
    )
    rows = g.collect()
    assert {r.metric for r in rows} == {"p50", "p90"}
    assert {r.key for r in rows} == {"red", "green", "blue"}
    assert len(rows) == 6
    for r in rows:
        assert 0.0 <= r.value_num <= 6.0


def test_schemas_compose(people):
    a = P.profile_columns(people, ["id"])
    b = P.profile_columns_approx(people, ["id"])
    c = P.heavy_hitters(people, "color", 1)
    combined = a.unionByName(b).unionByName(c)
    assert combined.columns == ["section", "key", "metric", "value_num", "value_str"]
    assert combined.count() == a.count() + b.count() + c.count()
