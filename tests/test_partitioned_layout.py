"""Time-partitioned table layout: hive-style partitionBy(day) writes and
partition PRUNING on read — the hypertable pattern that keeps a 100 TB
event store scannable (a day-filter touches one directory, not the
table)."""

import pytest
from pyspark.sql import functions as F

from pyspark_entity_resolution_spark.plans.common import load_events


@pytest.fixture(scope="module")
def partitioned_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_by_day") / "tbl")
    (
        load_events(spark, "/root/testdata/sf0.001")
        .withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .write.partitionBy("day")
        .mode("overwrite")
        .parquet(d)
    )
    return d


def test_partition_pruning_in_plan(spark, partitioned_dir):
    df = spark.read.parquet(partitioned_dir).filter(F.col("day") == "2024-01-03")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "2024-01-03" in plan
    # pruned scan reads exactly the one day
    got = df.select("event_id").count()
    expected = (
        load_events(spark, "/root/testdata/sf0.001")
        .filter(F.date_format("ts", "yyyy-MM-dd") == "2024-01-03")
        .count()
    )
    assert got == expected > 0


def test_partitioned_roundtrip_complete(spark, partitioned_dir):
    total = spark.read.parquet(partitioned_dir).count()
    assert total == load_events(spark, "/root/testdata/sf0.001").count()
