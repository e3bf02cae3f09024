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


def test_jsonl_roundtrip(spark, tmp_path):
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    from pyspark_entity_resolution_spark.sources.io import read_jsonl, write_jsonl

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ])
    rows = [(1, "hello world", "en"), (2, 'quotes " and \\ slashes', "en"),
            (3, None, "de")]
    df = spark.createDataFrame(rows, schema)
    dest = str(tmp_path / "out")
    write_jsonl(df, dest)
    back = read_jsonl(spark, dest, schema=schema)
    assert sorted(map(tuple, back.collect())) == sorted(rows)


def test_jsonl_corrupt_record_quarantine(spark, tmp_path):
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    from pyspark_entity_resolution_spark.sources.io import read_jsonl

    p = tmp_path / "data.jsonl"
    p.write_text('{"doc_id": 1, "text": "ok"}\n'
                 'this is not json\n'
                 '{"doc_id": 2, "text": "also ok"}\n')
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("_corrupt_record", StringType()),
    ])
    rows = read_jsonl(spark, str(p), schema=schema).collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert {r["doc_id"] for r in good} == {1, 2}
    assert len(bad) == 1 and "not json" in bad[0]["_corrupt_record"]


def test_spread_is_width_adaptive(spark, tmp_path):
    """r11: spread() with a byte estimate repartitions ONLY narrow scans —
    a wide (pre-partitioned, at-scale) input must not pay a round-robin
    shuffle of every byte, while the local single-file corpus still fans
    out to cluster parallelism."""
    from pyspark_entity_resolution_spark.plans.common import (
        load_spread,
        spread,
        table_bytes,
    )

    df = spark.range(100)
    wide = spread(spark, df, input_bytes=200 * 1024**3)
    narrow = spread(spark, df, input_bytes=1024)
    unconditional = spread(spark, df)
    assert "Repartition" not in wide._jdf.queryExecution().logical().toString()
    assert "Repartition" in narrow._jdf.queryExecution().logical().toString()
    assert "Repartition" in unconditional._jdf.queryExecution().logical().toString()
    # load_spread wires the real file size in; identical rows either way
    p = str(tmp_path / "t.parquet")
    spark.range(50).write.parquet(p)
    got = load_spread(spark, str(tmp_path), "t")
    assert sorted(r["id"] for r in got.collect()) == list(range(50))
    assert table_bytes(str(tmp_path), "t") > 0


def test_parse_byte_string_accepts_every_legal_spark_form():
    """r12 (ADVICE r11): the r11 parser crashed on two-letter suffixes
    ('128mb' -> int('128m') ValueError at query-build time) and silently
    multiplied unknown suffixes by 1. Every legal Spark byte string must
    parse; garbage falls back to the 128 MB default instead of raising."""
    from pyspark_entity_resolution_spark.plans.common import _parse_byte_string

    mb = 1024**2
    assert _parse_byte_string("134217728") == 128 * mb
    assert _parse_byte_string("128m") == 128 * mb
    assert _parse_byte_string("128mb") == 128 * mb
    assert _parse_byte_string("128MB") == 128 * mb
    assert _parse_byte_string("1g") == 1024**3
    assert _parse_byte_string("1gb") == 1024**3
    assert _parse_byte_string("64k") == 64 * 1024
    assert _parse_byte_string("512b") == 512
    assert _parse_byte_string("1t") == 1024**4
    # unparseable -> conservative default, never an exception
    assert _parse_byte_string("auto") == 128 * mb
    assert _parse_byte_string("128 m b") == 128 * mb
    assert _parse_byte_string("") == 128 * mb


def test_spread_survives_unit_suffixed_max_partition_bytes(spark):
    """The width decision must work under any legal maxPartitionBytes
    conf form, including the '128mb' shape that crashed the r11 parser."""
    from pyspark_entity_resolution_spark.plans.common import spread

    key = "spark.sql.files.maxPartitionBytes"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "128mb")
        df = spark.range(10)
        wide = spread(spark, df, input_bytes=200 * 1024**3)
        narrow = spread(spark, df, input_bytes=1024)
        assert "Repartition" not in wide._jdf.queryExecution().logical().toString()
        assert "Repartition" in narrow._jdf.queryExecution().logical().toString()
    finally:
        spark.conf.set(key, old)


def test_table_helpers_count_all_nonhidden_files(spark, tmp_path):
    """r12 (ADVICE r11): table_rowcount/table_bytes must see the same
    file set spark.read.parquet does — all non-hidden, non-underscore
    files, whatever their names — and raise on an empty directory
    instead of silently returning 0."""
    import shutil

    import pytest

    from pyspark_entity_resolution_spark.plans.common import (
        table_bytes,
        table_rowcount,
    )

    p = tmp_path / "t.parquet"
    spark.range(50).write.parquet(str(p))
    # rename the part files so the old '*.parquet' glob would miss them
    for f in os.listdir(p):
        if f.endswith(".parquet") and not f.startswith((".", "_")):
            os.rename(p / f, p / f.removesuffix(".parquet"))
    assert spark.read.parquet(str(p)).count() == 50
    assert table_rowcount(str(tmp_path), "t") == 50
    assert table_bytes(str(tmp_path), "t") > 0

    empty = tmp_path / "e.parquet"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        table_rowcount(str(tmp_path), "e")
    shutil.rmtree(empty)
