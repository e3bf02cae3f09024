"""Contamination-detection unit tests (operators/contamination.py)."""

from pyspark.sql import functions as F

from pyspark_entity_resolution_spark.operators.contamination import (
    contaminated_ids,
    contamination_report,
    shingle_hashes,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_copy_is_fully_contaminated(spark):
    text = "one two three four five six seven eight"
    train = _docs(spark, [(0, text), (2, "totally different words entirely here now")])
    eval_ = _docs(spark, [(1, text)])
    row = contamination_report(train, eval_, w=5).first()
    assert row.eval_id == 1
    assert row.n_contaminated == row.n_shingles > 0
    assert row.contamination_rate == 1.0
    assert row.n_train_docs == 1


def test_clean_doc_reports_zero_but_is_kept(spark):
    train = _docs(spark, [(0, "alpha beta gamma delta epsilon zeta")])
    eval_ = _docs(spark, [(1, "un deux trois quatre cinq six sept")])
    rows = contamination_report(train, eval_, w=5).collect()
    assert len(rows) == 1  # total report: clean docs still present
    assert rows[0].n_contaminated == 0
    assert rows[0].contamination_rate == 0.0
    assert rows[0].n_train_docs == 0


def test_partial_overlap_counts_shared_shingles(spark):
    # eval doc shares exactly its first 6 tokens with train -> the two
    # 5-gram shingles starting inside that span are contaminated
    train = _docs(spark, [(0, "a b c d e f QQ RR SS TT UU")])
    eval_ = _docs(spark, [(1, "a b c d e f x y z w v")])
    row = contamination_report(train, eval_, w=5).first()
    assert row.n_shingles == 7  # 11 tokens -> 7 shingles
    assert row.n_contaminated == 2  # 'a b c d e', 'b c d e f'
    assert 0 < row.contamination_rate < 1


def test_blast_radius_counts_distinct_train_docs(spark):
    shared = "p q r s t"
    train = _docs(
        spark,
        [(0, f"{shared} extra0 tokens here"), (2, f"{shared} other1 stuff there")],
    )
    eval_ = _docs(spark, [(1, f"{shared} unrelated tail words")])
    row = contamination_report(train, eval_, w=5).first()
    assert row.n_train_docs == 2


def test_contaminated_ids_threshold(spark):
    dirty = "one two three four five six"
    train = _docs(spark, [(0, dirty)])
    eval_ = _docs(spark, [(1, dirty), (3, "clean fresh new unseen words here")])
    ids = {r.eval_id for r in contaminated_ids(train, eval_, threshold=0.5).collect()}
    assert ids == {1}


def test_short_doc_truncated_shingle_contract(spark):
    # docs shorter than w yield ONE whole-doc shingle (word_shingles
    # contract) so identical short docs still register as contaminated
    train = _docs(spark, [(0, "tiny doc")])
    eval_ = _docs(spark, [(1, "tiny doc")])
    row = contamination_report(train, eval_, w=5).first()
    assert (row.n_shingles, row.n_contaminated) == (1, 1)


def test_shingle_hashes_distinct(spark):
    # repeated shingles inside one doc collapse before the join
    df = _docs(spark, [(7, "x y x y x y x y")])
    n = shingle_hashes(df, w=2).count()
    distinct = shingle_hashes(df, w=2).distinct().count()
    assert n == distinct


def test_streaming_flags_match_batch(spark, tmp_path):
    """The streaming flag set equals the batch report's hit set."""
    from pyspark_entity_resolution_spark.operators.contamination import (
        streaming_contamination_flags,
    )
    from pyspark_entity_resolution_spark.streaming.pipeline import (
        run_to_memory_sink,
    )

    shared = "one two three four five six"
    train = _docs(spark, [(0, shared), (2, "totally unrelated training text here")])
    eval_rows = [(1, shared + " tail"), (3, "clean eval document nothing shared"),
                 (5, "another clean one with fresh words")]
    src = str(tmp_path / "eval_docs")
    _docs(spark, eval_rows).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = run_to_memory_sink(
        streaming_contamination_flags(stream, train, w=5), "contam_flags"
    )
    q.awaitTermination(60)
    flagged = {r.eval_id for r in spark.table("contam_flags").collect()}

    batch = contamination_report(train, _docs(spark, eval_rows), w=5)
    batch_hits = {r.eval_id for r in batch.filter("n_contaminated > 0").collect()}
    assert flagged == batch_hits == {1}


def test_streaming_flags_watermarked_state_bounded(spark, tmp_path):
    """event_time_col path: withWatermark + dropDuplicatesWithinWatermark
    — same flag set, and the plan carries a bounded dedup-within-watermark
    operator instead of unbounded keyed dedup state."""
    from pyspark.sql import functions as F
    from pyspark_entity_resolution_spark.operators.contamination import (
        streaming_contamination_flags,
    )
    from pyspark_entity_resolution_spark.streaming.pipeline import (
        run_to_memory_sink,
    )

    shared = "one two three four five six"
    train = _docs(spark, [(0, shared)])
    src = str(tmp_path / "eval_docs_wm")
    (
        _docs(spark, [(1, shared + " tail"), (3, "clean eval document nothing shared")])
        .withColumn("ts", F.to_timestamp(F.lit("2026-01-01 00:00:00")))
        .write.mode("overwrite")
        .parquet(src)
    )
    stream = spark.readStream.schema(
        "doc_id long, text string, ts timestamp"
    ).parquet(src)
    flags = streaming_contamination_flags(
        stream, train, w=5, event_time_col="ts", watermark="1 minute"
    )
    assert flags.columns == ["eval_id"]
    q = run_to_memory_sink(flags, "contam_flags_wm")
    q.awaitTermination(60)
    assert {r.eval_id for r in spark.table("contam_flags_wm").collect()} == {1}
