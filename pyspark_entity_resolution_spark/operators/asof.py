"""As-of (most-recent-prior) join — a temporal operator Spark lacks as a
builtin, composed from existing DataFrame ops (SURVEY.md §2 "custom
operators" guidance: composition first, UDFs never).

Plan shape: tag both sides, union them, and run ONE window pass per key
ordered by (ts, side) carrying the last right-side row forward
(``last(..., ignoreNulls=True)``). That is a single shuffle on the key —
no range cross-join, no per-row probing — and it scales to arbitrarily
large sides because the window is a linear scan within each key
partition. Right rows at the exact left timestamp match (<= semantics),
implemented by sorting the right side before the left at equal
timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For every left row, attach the most recent right row with
    ``right_ts <= left_ts`` within the same ``on`` keys (left join
    semantics: unmatched left rows keep NULLs)."""
    on = list(on)
    right_cols = right_cols or [c for c in right.columns if c not in on]
    # right_ts always travels as __r_ts; keep it out of the payload loop so
    # an explicit right_cols list that mentions it doesn't duplicate the
    # column (ambiguous-reference failure downstream)
    right_cols = [c for c in right_cols if c != right_ts]

    lhs = left.withColumn("__is_left", F.lit(1)).withColumn(
        "__ts", F.col(left_ts)
    )
    payload = [F.col(right_ts).alias(f"__r_ts")] + [
        F.col(c).alias(f"__r_{c}") for c in right_cols
    ]
    rhs = (
        right.select(*on, F.col(right_ts).alias("__ts"), *payload)
        .withColumn("__is_left", F.lit(0))
    )

    unioned = lhs.unionByName(rhs, allowMissingColumns=True)

    # right rows sort BEFORE left rows at the same timestamp -> <= semantics
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        F.last("__r_ts", ignorenulls=True).over(w).alias(f"{right_ts}{suffix}"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_cols
        ],
    )
    drop = ["__is_left", "__ts", "__r_ts"] + [f"__r_{c}" for c in right_cols]
    return carried.filter(F.col("__is_left") == 1).drop(*drop)
