"""Skew-mitigation utilities for hot-key joins.

AQE's skew-join splitting handles sort-merge skew automatically, but
replicated salting is still the tool of choice when one blocking key
dominates (one venue-year holding half the corpus, one LSH bucket
collecting boilerplate docs). ``salted_join`` implements the standard
replicate-the-small-side pattern as a declarative plan:

- the LARGE side gets a deterministic salt in [0, n) hashed from its
  whole row (uniform, reproducible — no rand(), which would break
  retry/stage-recompute consistency);
- the SMALL side is exploded n-fold, once per salt value;
- the join key becomes (key, salt), spreading each hot key over n
  reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, n: int, cols: list[str] | None = None) -> DataFrame:
    """Deterministic salt in [0, n): xxhash64 of ``cols`` (default: all
    columns) mod n. Stage retries recompute the identical salt."""
    basis = cols or df.columns
    return df.withColumn(SALT_COL, F.pmod(F.xxhash64(*basis), F.lit(n)).cast("int"))


def replicate(df: DataFrame, n: int) -> DataFrame:
    """Explode a DataFrame n-fold, one copy per salt value."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``large ⋈ small`` on ``on`` with hot keys spread across
    ``num_salts`` partitions. ``small`` is replicated num_salts times —
    use only when small is genuinely small or the skew is real."""
    left = with_salt(large, num_salts)
    right = replicate(small, num_salts)
    return left.join(right, on=[*on, SALT_COL], how=how).drop(SALT_COL)
