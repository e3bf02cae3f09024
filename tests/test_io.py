"""Parquet/CSV source & sink tests (SURVEY.md §2.1 S2-S6)."""

import os

from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from pyspark_entity_resolution_spark.sources.io import (
    read_csv,
    read_parquet,
    write_csv,
    write_parquet,
)


def _sample(spark):
    return spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], ["id", "name"]
    )


def test_parquet_roundtrip(spark, tmp_path):
    df = _sample(spark)
    dest = str(tmp_path / "out_parquet")
    write_parquet(df, dest)
    back = read_parquet(spark, dest)
    assert sorted(r["name"] for r in back.collect()) == ["alpha", "beta", "gamma"]
    # overwrite mode works
    write_parquet(df.limit(1), dest)
    assert read_parquet(spark, dest).count() == 1


def test_parquet_single_file(spark, tmp_path):
    dest = str(tmp_path / "single")
    write_parquet(_sample(spark), dest, single_file=True)
    parts = [f for f in os.listdir(dest) if f.endswith(".parquet")]
    assert len(parts) == 1


def test_csv_sink_with_rename(spark, tmp_path):
    dest = str(tmp_path / "out_csv")
    write_csv(_sample(spark), dest, sep="\t", rename_to="Matched_Entities.csv")
    assert "Matched_Entities.csv" in os.listdir(dest)

    schema = StructType(
        [StructField("id", IntegerType()), StructField("name", StringType())]
    )
    back = read_csv(
        spark, os.path.join(dest, "Matched_Entities.csv"), delimiter="\t",
        schema=schema,
    )
    assert sorted(r["name"] for r in back.collect()) == ["alpha", "beta", "gamma"]


def test_csv_infer_schema(spark, tmp_path):
    dest = str(tmp_path / "infer_csv")
    write_csv(_sample(spark), dest)
    csv_file = [f for f in os.listdir(dest) if f.endswith(".csv")][0]
    back = read_csv(spark, os.path.join(dest, csv_file), infer_schema=True)
    assert dict(back.dtypes)["id"] in ("int", "bigint")
