"""Ingest-time exact dedup against an accepted corpus (operators/dedup.py)."""

from pyspark_entity_resolution_spark.operators.dedup import (
    incremental_exact_dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_history_hits_and_batch_dups_drop(spark):
    history = _docs(spark, [(0, "seen before content here")])
    arriving = _docs(
        spark,
        [
            (10, "seen   before content here "),  # whitespace-normalized hit
            (11, "brand new document one"),
            (12, "brand new document one"),       # within-batch dup of 11
            (13, "brand new document two"),
        ],
    )
    kept = {r.doc_id for r in incremental_exact_dedup(arriving, history).collect()}
    assert kept == {11, 13}


def test_streaming_anti_join_form(spark, tmp_path):
    from pyspark_entity_resolution_spark.streaming.pipeline import (
        run_to_memory_sink,
    )

    history = _docs(spark, [(0, "historic text body")])
    src = str(tmp_path / "arrivals")
    _docs(spark, [(10, "historic text body"), (11, "fresh text body")]).write.mode(
        "overwrite"
    ).parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = run_to_memory_sink(
        incremental_exact_dedup(stream, history), "ingest_dedup"
    )
    q.awaitTermination(60)
    kept = {r.doc_id for r in spark.table("ingest_dedup").collect()}
    assert kept == {11}
