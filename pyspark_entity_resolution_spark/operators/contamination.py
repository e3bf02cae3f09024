"""Train/eval contamination detection via word-shingle overlap.

The standard benchmark-decontamination pass for LLM training corpora:
an eval document is contaminated when enough of its word n-gram
shingles appear verbatim somewhere in the training corpus.

Scale shape (the whole point): NEVER compare documents pairwise.
Both sides explode to DISTINCT (id, shingle-hash) rows, so the overlap
test is one equi-join on the 16-byte shingle hash — shuffle partitioned
by hash, no skew beyond natural shingle popularity (and a popular
shingle is exactly what AQE's skew-join split handles). At 100 TB the
train side is the big one; the join output is aggregated per eval doc
immediately, so nothing wide survives the shuffle.

No reference analog; part of the training-data-pipeline extension
suite. Shingling reuses ``functions.text.word_shingles`` (same
truncated-shingle-for-short-docs contract as the fingerprinting ops).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_shingles


def shingle_hashes(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", w: int = 5
) -> DataFrame:
    """DISTINCT (id, md5(shingle)) pairs — the join-ready shingle set."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.array_distinct(word_shingles(F.col(text_col), w))).alias(
                "shingle"
            ),
        )
        .select("id", F.md5(F.col("shingle")).alias("sh"))
    )


def contamination_report(
    train: DataFrame,
    eval_: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 5,
) -> DataFrame:
    """Per-eval-document contamination stats.

    Returns one row per eval document:
      eval_id, n_shingles (distinct in the doc), n_contaminated (of
      those, found anywhere in train), contamination_rate, and
      n_train_docs (distinct training documents sharing at least one
      shingle — the blast radius).

    Clean documents are kept (zero counts) so the output is a total
    report, not just the hit list.
    """
    ev = shingle_hashes(eval_, text_col, id_col, w)
    if not eval_.isStreaming:
        # `ev` feeds BOTH the totals aggregate and the hits join, so
        # without a barrier the eval side tokenizes + shingles + hashes
        # twice (same pattern as dedup.py's ngram barrier). The
        # materialized rows are slim (id, 32-char hash) and the eval
        # side is the small one in a decontamination pass. Measured at
        # sf1 interleaved: 5.8 -> 5.3 s steady-state with identical
        # output; cold first run 13.7 -> 5.6 s (one documents scan
        # instead of two).
        ev = ev.localCheckpoint(eager=False)
    tr = shingle_hashes(train, text_col, id_col, w).select(
        F.col("id").alias("train_id"), "sh"
    )

    totals = ev.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))

    hits = (
        ev.join(tr, on="sh")  # one hash equi-join — the only big shuffle
        .groupBy("id")
        .agg(
            F.countDistinct("sh").alias("n_contaminated"),
            F.countDistinct("train_id").alias("n_train_docs"),
        )
    )

    return (
        totals.join(hits, on="id", how="left")
        .select(
            F.col("id").alias("eval_id"),
            "n_shingles",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            F.round(
                F.coalesce("n_contaminated", F.lit(0)) / F.col("n_shingles"), 6
            ).alias("contamination_rate"),
            F.coalesce("n_train_docs", F.lit(0)).alias("n_train_docs"),
        )
    )


def contaminated_ids(
    train: DataFrame,
    eval_: DataFrame,
    threshold: float = 0.1,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 5,
) -> DataFrame:
    """Eval ids whose contamination_rate exceeds ``threshold`` — the
    drop-list a decontamination pass feeds back into sampling."""
    rep = contamination_report(train, eval_, text_col, id_col, w)
    return rep.filter(F.col("contamination_rate") > threshold).select("eval_id")


def streaming_contamination_flags(
    eval_stream: DataFrame,
    train: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 5,
    event_time_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin: flag arriving eval documents that share ANY
    shingle with the (static) training corpus.

    Shingling is a stateless explode, so it runs unchanged over a
    stream; the overlap test becomes a stream-static LEFT SEMI join
    (Structured Streaming broadcasts/rescans the static side per
    micro-batch — at scale, materialize the train shingle set once and
    let the join prune on the hash). Per-document RATES need keyed
    aggregation state; the flag formulation needs only per-id DEDUP
    state (a doc's shingles collide many times), and how that state is
    bounded is the caller's choice:

    - ``event_time_col=None`` (default): plain ``dropDuplicates`` —
      keyed state that grows with the cardinality of flagged eval ids,
      forever. Fine for bounded eval sets; NOT unbounded-safe.
    - ``event_time_col='ts'``: a ``withWatermark(ts, watermark)`` +
      ``dropDuplicatesWithinWatermark`` pipeline — per-id state expires
      once the watermark passes, bounding state by the flagged-id ARRIVAL
      RATE within the watermark horizon (a re-flag of the same id after
      expiry emits a duplicate row, the standard trade).
    """
    tr = shingle_hashes(train, text_col, id_col, w).select("sh")
    if event_time_col is None:
        ev = shingle_hashes(eval_stream, text_col, id_col, w)
        return (
            ev.join(tr, on="sh", how="left_semi")
            .select(F.col("id").alias("eval_id"))
            .dropDuplicates(["eval_id"])
        )
    src = eval_stream.withWatermark(event_time_col, watermark)
    ev = src.select(
        F.col(id_col).alias("eval_id"),
        F.col(event_time_col),
        F.explode(
            F.array_distinct(word_shingles(F.col(text_col), w))
        ).alias("shingle"),
    ).select("eval_id", event_time_col, F.md5(F.col("shingle")).alias("sh"))
    return (
        ev.join(tr, on="sh", how="left_semi")
        .select("eval_id", event_time_col)
        .dropDuplicatesWithinWatermark(["eval_id"])
        .select("eval_id")
    )
