"""r11: the MinHash-LSH pack shares ONE banded projection + ONE
verification profile across its three sections. These tests pin that the
refactored pieces are row-identical to the paths they replaced:

- minhash_lsh_candidates == candidates_from_banded(minhash_banded(...))
  (the split must be a pure extraction),
- an accepted-subset FILTER of minhash_banded reshaped to
  (id, keys, band_idx, band_key) == minhash_corpus_index of that subset,
- incremental_minhash_matches with the arriving_banded/arriving_profile
  bypass == the self-built path (string profile) == the hashed shared
  profile (injective-hash jaccard equality).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_entity_resolution_spark.operators import dedup as D

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),
    (10, "the quick brown fox jumps over the lazy dog"),
    (11, "pack my box with five dozen liquor jugs"),
    (20, "pack my box with five dozen liquor jugs today"),
    (21, "sphinx of black quartz judge my vow"),
    (30, "sphinx of black quartz judge my vow now"),
    (31, "how vexingly quick daft zebras jump"),
    (40, "how vexingly quick daft zebras jump high"),
    (41, "the quick brown fox naps under the lazy dog"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_candidates_split_is_pure_extraction(docs):
    old = D.minhash_lsh_candidates(docs, num_hashes=12, bands=3)
    banded = D.minhash_banded(docs, num_hashes=12, bands=3)
    new = D.candidates_from_banded(banded, bands=3)
    assert _rows(old) == _rows(new)
    assert len(_rows(new)) > 0  # fixture plants near-dups


def test_banded_filter_equals_corpus_index(docs):
    accepted = docs.filter(F.col("doc_id") % 10 == 0)
    idx_old = D.minhash_corpus_index(accepted, num_hashes=12, bands=3)
    banded = D.minhash_banded(docs, num_hashes=12, bands=3)
    idx_new = banded.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("id"),
        F.array(*[F.col(f"k{j}") for j in range(3)]).alias("keys"),
        "band_idx", "band_key",
    )
    assert _rows(idx_old) == _rows(idx_new)


def test_matches_bypass_equals_selfbuilt(docs):
    accepted = docs.filter(F.col("doc_id") % 10 == 0)
    arriving = docs.filter(F.col("doc_id") % 10 == 1)
    idx = D.minhash_corpus_index(accepted, num_hashes=12, bands=3)
    prof_str = D.token_profile(accepted)
    old = D.incremental_minhash_matches(
        arriving, idx, prof_str, num_hashes=12, bands=3, threshold=0.5
    )
    # shared projections, hashed profile (the pack's r11 shape)
    banded = D.minhash_banded(docs, num_hashes=12, bands=3)
    prof = D.jaccard_profile(docs)
    idx2 = banded.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("id"),
        F.array(*[F.col(f"k{j}") for j in range(3)]).alias("keys"),
        "band_idx", "band_key",
    )
    new = D.incremental_minhash_matches(
        arriving, idx2,
        prof.filter(F.col("doc_id") % 10 == 0).select(
            F.col("doc_id").alias("id"), "toks", "nt"
        ),
        num_hashes=12, bands=3, threshold=0.5,
        arriving_banded=banded.filter(F.col("doc_id") % 10 == 1),
        arriving_profile=prof.filter(F.col("doc_id") % 10 == 1),
    )
    assert _rows(old) == _rows(new)
    assert len(_rows(new)) > 0


def test_matches_bypass_requires_both(docs):
    accepted = docs.filter(F.col("doc_id") % 10 == 0)
    arriving = docs.filter(F.col("doc_id") % 10 == 1)
    idx = D.minhash_corpus_index(accepted, num_hashes=12, bands=3)
    banded = D.minhash_banded(docs, num_hashes=12, bands=3)
    with pytest.raises(ValueError, match="together"):
        D.incremental_minhash_matches(
            arriving, idx, D.token_profile(accepted),
            arriving_banded=banded.filter(F.col("doc_id") % 10 == 1),
        )


def test_matches_bypass_rejects_mixed_token_representations(docs):
    """r12 (ADVICE r11): a hashed (bigint) arriving profile against a
    raw-string corpus profile makes every jaccard intersection empty and
    silently drops all matches — the bypass must raise instead."""
    accepted = docs.filter(F.col("doc_id") % 10 == 0)
    arriving = docs.filter(F.col("doc_id") % 10 == 1)
    idx = D.minhash_corpus_index(accepted, num_hashes=12, bands=3)
    banded = D.minhash_banded(docs, num_hashes=12, bands=3)
    hashed_prof = D.jaccard_profile(docs)          # bigint tokens
    str_prof = D.token_profile(accepted)           # raw string tokens
    with pytest.raises(ValueError, match="token representations"):
        D.incremental_minhash_matches(
            arriving, idx, str_prof, num_hashes=12, bands=3,
            arriving_banded=banded.filter(F.col("doc_id") % 10 == 1),
            arriving_profile=hashed_prof.filter(F.col("doc_id") % 10 == 1),
        )


def test_verify_profile_reuse_equals_inline(docs):
    cands = D.minhash_lsh_candidates(docs, num_hashes=12, bands=3)
    old = D.verify_token_jaccard(cands, docs, threshold=0.3)
    prof = D.jaccard_profile(docs)
    new = D.verify_token_jaccard(cands, docs, threshold=0.3, profile=prof)
    assert _rows(old) == _rows(new)
    assert len(_rows(new)) > 0
