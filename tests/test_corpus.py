"""Composed training-corpus prep pipeline: stage semantics + funnel."""

import pytest
from pyspark.sql import functions as F

from pyspark_entity_resolution_spark.operators.corpus import (
    chunk_documents,
    corpus_funnel,
    drop_exact_duplicates,
    drop_near_duplicates,
    prepare_training_corpus,
    quality_gate,
)

BASE = (
    "the quick brown fox jumps over the lazy dog and keeps running through "
    "the quiet green fields toward the distant hills under a clear sky"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # 1 and 2: exact duplicates modulo whitespace (2 loses, higher id)
        (1, BASE, "en", "web"),
        (2, "  " + BASE.replace(" fox", "  fox") + " ", "en", "web"),
        # 3: near-dup of 1 (one word changed) -> loses to 1
        (3, BASE.replace("lazy", "sleepy"), "en", "web"),
        # 4: distinct clean doc
        (4, "completely different content about distributed query engines "
            "processing large analytical workloads with columnar storage "
            "and vectorized execution across many machines", "en", "web"),
        # 5: junk (punctuation soup) -> quality gate drops
        (5, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))", "en", "web"),
        # 6: too short -> quality gate drops
        (6, "tiny doc", "en", "web"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])


def test_quality_gate_drops_junk(spark, docs):
    kept = {r["doc_id"] for r in quality_gate(docs, min_score=0.75).select("doc_id").collect()}
    assert 5 not in kept and 6 not in kept
    assert {1, 2, 3, 4} <= kept


def test_exact_dedup_keeps_min_id(spark, docs):
    kept = {
        r["doc_id"]
        for r in drop_exact_duplicates(docs).select("doc_id").collect()
    }
    assert 1 in kept and 2 not in kept  # 2 is whitespace-identical to 1
    assert {3, 4, 5, 6} <= kept         # non-dups untouched


def test_near_dedup_drops_larger_side(spark, docs):
    base = docs.filter(F.col("doc_id").isin([1, 3, 4]))
    kept = {
        r["doc_id"]
        for r in drop_near_duplicates(base).select("doc_id").collect()
    }
    assert kept == {1, 4}  # 3 is the larger side of the (1,3) near-dup pair


def test_chunking_covers_text_with_overlap(spark, docs):
    d4 = docs.filter(F.col("doc_id") == 4)
    text = d4.collect()[0]["text"]
    chunks = sorted(
        chunk_documents(d4, chunk_chars=64, overlap=16).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert len(chunks) >= 2
    # reassembling with the 48-char step reproduces the document
    step = 64 - 16
    rebuilt = chunks[0]["chunk_text"]
    for c in chunks[1:]:
        rebuilt = rebuilt[: c["chunk_idx"] * step] + c["chunk_text"]
    assert rebuilt == text
    # consecutive chunks agree on their overlap region
    for prev, nxt in zip(chunks, chunks[1:]):
        assert prev["chunk_text"][step:] == nxt["chunk_text"][: 64 - step]
    assert all(r["n_chunk_tokens"] > 0 for r in chunks)


def test_prepare_training_corpus_funnel(spark, docs):
    stages = prepare_training_corpus(docs, min_quality=0.75, chunk_chars=64, chunk_overlap=16)
    funnel = {r["stage"]: r["n"] for r in corpus_funnel(stages, docs).collect()}
    assert funnel["input"] == 6
    assert funnel["gated"] == 4          # junk + tiny dropped
    assert funnel["exact_deduped"] == 3  # 2 dropped
    assert funnel["near_deduped"] == 2   # 3 dropped (near-dup of 1)
    assert funnel["chunks"] >= funnel["near_deduped"]
    survivors = {
        r["doc_id"] for r in stages["near_deduped"].select("doc_id").collect()
    }
    assert survivors == {1, 4}


def test_span_cut_stage_removes_boilerplate(spark, docs):
    boiler = " ".join(f"license term {i} applies here" for i in range(4))  # 20 tokens
    extra = spark.createDataFrame(
        [(10, boiler + " alpha document body about storage engines and "
              "compaction strategies running on clustered machines",
          "en", "web"),
         (11, boiler + " beta document body covering stream processing "
              "watermarks state stores and exactly once delivery semantics",
          "en", "web")],
        ["doc_id", "text", "lang", "source"],
    )
    stages = prepare_training_corpus(
        docs.unionByName(extra),
        min_quality=0.2,
        cut_dup_spans_w=10,
        chunk_chars=64,
        chunk_overlap=16,
    )
    cut = {r.doc_id: r.text for r in stages["span_cut"].collect()}
    # both docs survive near-dedup (bodies differ); the shared license
    # boilerplate survives only in the first occurrence (doc 10)
    assert 10 in cut and 11 in cut
    assert "license term 0" in cut[10]
    assert "license term" not in cut[11]
    # schema restored for downstream stages (column order may differ)
    assert set(stages["span_cut"].columns) == set(stages["near_deduped"].columns)
    # funnel includes the stage in order
    funnel = [r.stage for r in corpus_funnel(
        stages, docs.unionByName(extra)).collect()]
    assert funnel == ["input", "gated", "exact_deduped", "near_deduped",
                      "span_cut", "chunks"]


def test_optional_repetition_and_pii_stages(spark, docs):
    spam = spark.createDataFrame(
        [(7, "buy now " * 30, "en", "web"),
         (8, "reach me at spam@example.com or +1-555-0100 about the quick "
             "brown fox jumping over lazy dogs near quiet green fields "
             "under clear skies every single day", "en", "web")],
        ["doc_id", "text", "lang", "source"],
    )
    stages = prepare_training_corpus(
        docs.unionByName(spam),
        min_quality=0.2,
        max_dup_ngram_frac=0.5,
        redact_pii=True,
        chunk_chars=64,
        chunk_overlap=16,
    )
    # the spam doc passes the base quality gate but dies at the
    # repetition gate; schema is unchanged for downstream stages
    gated_ids = {r.doc_id for r in stages["gated"].select("doc_id").collect()}
    rep_ids = {r.doc_id for r in stages["repetition_gated"].select("doc_id").collect()}
    assert 7 in gated_ids and 7 not in rep_ids
    assert stages["repetition_gated"].columns == stages["gated"].columns
    # no chunk carries raw PII; the [TAG] tokens are present instead
    chunks = " ".join(r.chunk_text for r in stages["chunks"].collect())
    assert "spam@example.com" not in chunks and "555-0100" not in chunks
    assert "[EMAIL]" in chunks and "[PHONE]" in chunks
    # funnel reports the optional stages in order
    funnel = [r.stage for r in corpus_funnel(
        stages, docs.unionByName(spam)).collect()]
    assert funnel == ["input", "gated", "repetition_gated", "exact_deduped",
                      "near_deduped", "redacted", "chunks"]


def test_winnow_fingerprint_stage(spark, docs):
    """winnow_k adds the fingerprint artifact stage over SURVIVING docs
    only, on the xx64 fast path by default; winnow_hash='md5' selects
    the oracle-reproducible hash and matches the standalone operator
    row-for-row. Fingerprints stay out of the doc-count funnel (they
    are per-fingerprint rows, not documents)."""
    from pyspark_entity_resolution_spark.operators.winnowing import (
        winnow_fingerprints,
    )

    stages = prepare_training_corpus(docs, winnow_k=8)
    fps = stages["fingerprints"]
    assert set(fps.columns) == {"doc_id", "fp_pos", "fp_hash"}
    surviving = {r.doc_id for r in stages["near_deduped"].collect()}
    fp_rows = fps.collect()
    assert fp_rows and {r.doc_id for r in fp_rows} == surviving
    # default is the xx64 fast path: 16-hex-digit digests (md5 is 32)
    assert all(len(r.fp_hash) == 16 for r in fp_rows)

    md5_stage = prepare_training_corpus(
        docs, winnow_k=8, winnow_hash="md5"
    )["fingerprints"]
    direct = winnow_fingerprints(stages["near_deduped"], k=8, hash="md5")
    assert sorted(map(tuple, md5_stage.collect())) == sorted(
        map(tuple, direct.collect())
    )
    funnel = [r.stage for r in corpus_funnel(stages, docs).collect()]
    assert "fingerprints" not in funnel
