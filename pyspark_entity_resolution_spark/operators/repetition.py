"""Gopher-style repetition quality signals for training corpora.

Repetitious documents (boilerplate, scraped listings, degenerate
generations) are the classic pre-training poison; the Gopher/MassiveText
rules filter on n-gram repetition fractions. Three per-document signals
over word n-grams:

  dup_ngram_frac       1 - distinct/total n-grams (how much repeats at all)
  top_ngram_frac       occurrences of the single most frequent n-gram /
                       total n-grams (single-phrase spam)
  dup_ngram_char_frac  characters inside n-grams that occur more than
                       once / all n-gram characters (char-weighted, the
                       Gopher formulation)

Scale shape: explode n-grams -> ONE (id, gram) count aggregate -> ONE
per-id aggregate. Cost is linear in corpus token count, partitioned by
(id, gram) then id; no per-document quadratic scan, so a 100k-token
document costs 100k rows, not 10^10 comparisons. Per-document scalar
formulations (filter-count per distinct gram) would be O(len^2) — that
is why this lives as a DataFrame operator, not a Column expression.

No reference analog; part of the training-data-pipeline extension suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_shingles


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 2
) -> DataFrame:
    """One row per document: (id_col, dup_ngram_frac, top_ngram_frac,
    dup_ngram_char_frac), each rounded to 6 digits (single int/int
    division per signal — cross-engine bit-stable)."""
    grams = df.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), n)).alias("gram"),
    )
    gc = grams.groupBy(id_col, "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    ).withColumn("glen", F.length("gram"))
    dup_chars = F.sum(
        F.when(F.col("cnt") > 1, F.col("cnt") * F.col("glen")).otherwise(F.lit(0))
    )
    return gc.groupBy(id_col).agg(
        F.round(
            F.lit(1.0) - F.count(F.lit(1)) / F.sum("cnt"), 6
        ).alias("dup_ngram_frac"),
        F.round(F.max("cnt") / F.sum("cnt"), 6).alias("top_ngram_frac"),
        F.round(
            dup_chars / F.sum(F.col("cnt") * F.col("glen")), 6
        ).alias("dup_ngram_char_frac"),
    )


def repetition_gate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    max_dup_ngram_frac: float = 0.5,
    max_top_ngram_frac: float = 0.5,
) -> DataFrame:
    """Drop documents whose repetition signals exceed the thresholds;
    surviving rows keep their signal columns (for downstream funnels)."""
    stats = repetition_stats(df, text_col, id_col, n)
    return (
        df.join(stats, on=id_col)
        .filter(
            (F.col("dup_ngram_frac") <= max_dup_ngram_frac)
            & (F.col("top_ngram_frac") <= max_top_ngram_frac)
        )
    )
