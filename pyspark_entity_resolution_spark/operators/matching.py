"""Pair scoring + rule-based matching (reference src/similarity.py:47-74).

Operates on a prefixed pair DataFrame (columns ``{l}_authors``,
``{l}_title``, ``{l}_num_authors``, ``{l}_venue`` and the ``{r}_*`` twins).
The filter order — venue agreement first, then Levenshtein band, then the
match rule, then Jaccard — matches the reference's manual expression
ordering; since each filter precedes the projection it depends on, Catalyst
preserves the cheap-before-expensive evaluation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.similarity import both_contain, match_rule, token_jaccard

DEFAULT_VENUES = ["sigmod", "vldb"]
SCORE_COL = "scores"
JACCARD_COL = "title_jaccard_sim"


def score_and_match(
    pairs: DataFrame,
    left_prefix: str = "a",
    right_prefix: str = "b",
    venues: list[str] | None = None,
    max_levenshtein: int = 10,
    min_jaccard: float = 0.6,
) -> DataFrame:
    """Filter venue-agreeing pairs, score author Levenshtein (-> ``scores``),
    apply the three-band rule, score title Jaccard (-> ``title_jaccard_sim``)
    and keep pairs above threshold."""
    l, r = left_prefix, right_prefix
    venues = DEFAULT_VENUES if venues is None else venues

    same_venue = both_contain(f"{l}_venue", f"{r}_venue", venues)
    # bounded levenshtein: the band filter below keeps scores in
    # [0, max_levenshtein), so the DP can early-exit at max_levenshtein - 1
    # (distances past the bound report -1 and are filtered) — same kept
    # rows and score values, substantially less work on long author strings
    scores = F.levenshtein(f"{l}_authors", f"{r}_authors", max_levenshtein - 1)

    scored = (
        pairs.filter(same_venue)
        .withColumn(SCORE_COL, scores)
        .filter(F.col(SCORE_COL) >= 0)
        .filter(
            match_rule(SCORE_COL, f"{l}_num_authors", f"{r}_num_authors", max_levenshtein)
        )
    )
    return scored.withColumn(
        JACCARD_COL, token_jaccard(f"{l}_title", f"{r}_title")
    ).filter(F.col(JACCARD_COL) >= min_jaccard)
