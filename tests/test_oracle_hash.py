"""Cross-engine determinism pins for the gate's aggregate-hash mode.

tools/check_oracle.py value-pins results too large to materialize by
computing the SAME order-insensitive (count, md5-sum) aggregate in
Spark and DuckDB (see its module docstring). That is only sound if
every canonicalization primitive is bit-for-bit identical across the
two engines — md5 hex output, hex→uint64 conversion, double×10⁴
rounding with ties away from zero, NULL/NaN sentinels, ISO date
rendering. These tests pin each primitive and the end-to-end equality
over a fixture covering the whole supported type domain.
"""

from __future__ import annotations

import datetime
from decimal import Decimal

import duckdb
import pytest

from tools.check_oracle import _duck_hash_agg, _spark_hash_agg


@pytest.fixture()
def con():
    return duckdb.connect()


def _fixture_df(spark, tmp_path):
    """One parquet with every supported type, nulls, NaN, unicode, and
    a value pair that only differs past the 4-digit rounding rule."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("i", T.IntegerType()),
        T.StructField("s", T.StringType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("b", T.BooleanType()),
        T.StructField("d", T.DateType()),
        T.StructField("m", T.DecimalType(12, 2)),
    ])
    rows = [
        (1, 7, "plain", 1.23456789, True,
         datetime.date(2020, 1, 2), Decimal("10.25")),
        (2, -3, "café ß中文", -7.5, False,
         datetime.date(1999, 12, 31), Decimal("-0.01")),
        (3, None, None, None, None, None, None),
        (4, 0, "", float("nan"), True,
         datetime.date(1970, 1, 1), Decimal("0.00")),
        # differs from row 1 only in the 9th decimal digit: BOTH engines
        # must collapse it to the same canonical 12346
        (5, 7, "plain", 1.23456788, True,
         datetime.date(2020, 1, 2), Decimal("10.25")),
    ]
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "hash_fixture.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path), f"{path}/*.parquet"


def test_hash_agg_cross_engine_equal(spark, con, tmp_path):
    df, glob = _fixture_df(spark, tmp_path)
    con.execute(f"CREATE VIEW t AS SELECT * FROM '{glob}'")
    s = _spark_hash_agg(df)
    d = _duck_hash_agg(con, "SELECT * FROM t")
    assert s is not None and d is not None
    assert s == d
    assert s[0] == 5


def test_hash_detects_single_value_change(spark, con, tmp_path):
    df, glob = _fixture_df(spark, tmp_path)
    con.execute(f"CREATE VIEW t AS SELECT * FROM '{glob}'")
    s = _spark_hash_agg(df)
    # same rowcount, one string cell changed -> hashsum must differ
    d = _duck_hash_agg(
        con,
        "SELECT id, i, CASE WHEN id = 1 THEN 'PLAIN' ELSE s END AS s, "
        "x, b, d, m FROM t",
    )
    assert s[0] == d[0]
    assert s[1] != d[1]
    # a float change UNDER the x10000 rounding rule must NOT differ
    d_same = _duck_hash_agg(
        con,
        "SELECT id, i, s, CASE WHEN id = 1 THEN x + 1e-9 ELSE x END AS x, "
        "b, d, m FROM t",
    )
    assert s == d_same


def test_hash_is_order_insensitive(spark, con, tmp_path):
    df, glob = _fixture_df(spark, tmp_path)
    con.execute(f"CREATE VIEW t AS SELECT * FROM '{glob}'")
    d_fwd = _duck_hash_agg(con, "SELECT * FROM t ORDER BY id")
    d_rev = _duck_hash_agg(con, "SELECT * FROM t ORDER BY id DESC")
    assert d_fwd == d_rev


def test_unsupported_type_returns_none_both_sides(spark, con):
    from pyspark.sql import functions as F

    df = spark.range(3).select(F.array(F.col("id")).alias("a"))
    assert _spark_hash_agg(df) is None
    assert _duck_hash_agg(con, "SELECT [1, 2] AS a") is None


def test_empty_result_hashes_equal(spark, con, tmp_path):
    df, glob = _fixture_df(spark, tmp_path)
    con.execute(f"CREATE VIEW t AS SELECT * FROM '{glob}'")
    s = _spark_hash_agg(df.filter("id < 0"))
    d = _duck_hash_agg(con, "SELECT * FROM t WHERE id < 0")
    assert s == d == (0, None)


def test_round_ties_away_from_zero_primitive(spark, con):
    """The one genuinely engine-specific rounding knob: Spark round()
    on DOUBLE is HALF_UP (away from zero), and DuckDB round(DOUBLE)
    must agree — including for negatives."""
    from pyspark.sql import functions as F

    row = spark.range(1).select(
        F.round(F.lit(2.5).cast("double"), 0).cast("bigint").alias("a"),
        F.round(F.lit(3.5).cast("double"), 0).cast("bigint").alias("b"),
        F.round(F.lit(-2.5).cast("double"), 0).cast("bigint").alias("c"),
    ).first()
    duck = con.execute(
        "SELECT CAST(round(2.5::DOUBLE) AS BIGINT), "
        "CAST(round(3.5::DOUBLE) AS BIGINT), "
        "CAST(round(-2.5::DOUBLE) AS BIGINT)"
    ).fetchone()
    assert (row.a, row.b, row.c) == duck == (3, 4, -3)
