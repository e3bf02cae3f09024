"""Repetition-signal unit tests (operators/repetition.py)."""

from pyspark_entity_resolution_spark.operators.repetition import (
    repetition_gate,
    repetition_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pure_spam_maxes_the_signals(spark):
    # 'buy now buy now ...' -> 2-grams alternate between two values
    df = _docs(spark, [(0, "buy now " * 10)])
    r = repetition_stats(df, n=2).first()
    # 19 grams, 2 distinct -> dup frac 17/19; top gram 'buy now' x10 -> 10/19
    assert r.dup_ngram_frac > 0.8
    assert r.top_ngram_frac > 0.5
    assert r.dup_ngram_char_frac == 1.0  # every gram occurs >1 time


def test_all_unique_text_scores_zero(spark):
    df = _docs(spark, [(1, "alpha beta gamma delta epsilon zeta eta")])
    r = repetition_stats(df, n=2).first()
    assert r.dup_ngram_frac == 0.0
    assert r.dup_ngram_char_frac == 0.0
    # 6 grams all distinct -> most frequent has count 1
    assert abs(r.top_ngram_frac - 1 / 6) < 1e-6


def test_char_weighting_differs_from_count_weighting(spark):
    # duplicated gram is much longer than the unique ones -> char-frac
    # exceeds count-derived dup fraction
    df = _docs(spark, [(2, "hippopotamus anteater hippopotamus anteater a b")])
    r = repetition_stats(df, n=2).first()
    assert r.dup_ngram_char_frac > r.dup_ngram_frac


def test_gate_drops_spam_keeps_prose(spark):
    df = _docs(
        spark,
        [
            (0, "buy now " * 10),
            (1, "a perfectly ordinary sentence with varied words throughout"),
        ],
    )
    kept = repetition_gate(df, n=2, max_dup_ngram_frac=0.5, max_top_ngram_frac=0.5)
    assert [r.doc_id for r in kept.collect()] == [1]
    # survivors carry their signal columns for downstream funnels
    assert "dup_ngram_frac" in kept.columns


def test_single_token_doc_truncated_shingle(spark):
    # < n tokens -> ONE whole-doc shingle (word_shingles contract): no
    # NULLs, no crash, zero repetition
    df = _docs(spark, [(3, "word")])
    r = repetition_stats(df, n=2).first()
    assert (r.dup_ngram_frac, r.top_ngram_frac) == (0.0, 1.0)
