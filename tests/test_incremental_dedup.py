"""Ingest-time dedup against an accepted corpus (operators/dedup.py):
exact (fingerprint anti-join) and near-dup (MinHash band index)."""

import pytest

from pyspark_entity_resolution_spark.operators.dedup import (
    incremental_exact_dedup,
    incremental_minhash_dedup,
    incremental_minhash_matches,
    minhash_corpus_index,
    token_profile,
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


HIST = [
    (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (1, "red orange yellow green blue indigo violet cyan magenta white"),
]
ARRIVING = [
    # same token SET as doc 0 (reordered + a repeat): jaccard 1.0 hit
    (10, "kappa iota theta eta zeta epsilon delta gamma beta alpha alpha"),
    (11, "one two three four five six seven eight nine ten"),
    # within-batch near-dup of 11 (identical set, reversed): larger id loses
    (12, "ten nine eight seven six five four three two one"),
    (13, "completely different tokens here nothing shared with others"),
    # partial near-dup of doc 0: 9 of 10 tokens shared, jaccard 9/11
    (20, "alpha beta gamma delta epsilon zeta eta theta iota newtok"),
]


def test_near_dup_matches_against_index(spark):
    hist = _docs(spark, HIST)
    idx, prof = minhash_corpus_index(hist), token_profile(hist)
    m = {
        (r.doc_id, r.accepted_id): r.jaccard
        for r in incremental_minhash_matches(_docs(spark, ARRIVING), idx, prof).collect()
    }
    assert set(m) == {(10, 0), (20, 0)}
    assert m[(10, 0)] == 1.0
    assert m[(20, 0)] == pytest.approx(9 / 11)


def test_near_dup_ingest_drops_history_and_batch_losers(spark):
    hist = _docs(spark, HIST)
    idx, prof = minhash_corpus_index(hist), token_profile(hist)
    kept = {
        r.doc_id
        for r in incremental_minhash_dedup(_docs(spark, ARRIVING), idx, prof).collect()
    }
    assert kept == {11, 13}
    # without the intra-batch pass, only history matches drop
    kept_wb = {
        r.doc_id
        for r in incremental_minhash_dedup(
            _docs(spark, ARRIVING), idx, prof, within_batch=False
        ).collect()
    }
    assert kept_wb == {11, 12, 13}


def test_near_dup_matches_streaming_form(spark, tmp_path):
    from pyspark_entity_resolution_spark.streaming.pipeline import (
        run_to_memory_sink,
    )

    hist = _docs(spark, HIST)
    idx = minhash_corpus_index(hist).localCheckpoint()
    prof = token_profile(hist).localCheckpoint()
    src = str(tmp_path / "near_arrivals")
    _docs(spark, ARRIVING).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = run_to_memory_sink(
        incremental_minhash_matches(stream, idx, prof), "ingest_near_dedup"
    )
    q.awaitTermination(60)
    m = {
        (r.doc_id, r.accepted_id)
        for r in spark.table("ingest_near_dedup").collect()
    }
    assert m == {(10, 0), (20, 0)}


def test_near_dup_dedup_rejects_streams(spark, tmp_path):
    hist = _docs(spark, HIST)
    idx, prof = minhash_corpus_index(hist), token_profile(hist)
    src = str(tmp_path / "reject_arrivals")
    _docs(spark, ARRIVING).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    with pytest.raises(ValueError, match="foreachBatch"):
        incremental_minhash_dedup(stream, idx, prof)


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
