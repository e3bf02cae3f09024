"""foreachBatch ingest drivers for the incremental near-dup matchers.

The direct streaming forms of ``incremental_minhash_matches`` /
``incremental_embedding_matches`` are stream-static joins, which cannot
re-join the verification payload (token arrays / vectors) onto admitted
candidates after the band/key explode — the payload rides THROUGH the
exploded join, duplicated bands-x per document (documented and bounded
by micro-batch size, operators/dedup.py + operators/ann.py). These
drivers fold each micro-batch through the slim BATCH path instead
(payload joined post-admission), exactly the way
``streaming_resolve_entities`` folds match pairs for ER: inside
``foreachBatch`` the batch DataFrame is non-streaming, so the matchers
take their slim plan automatically, and the per-batch results append to
a parquet sink.

Batch-path equivalence with the direct streaming form is pinned in
tests/test_incremental_dedup.py / tests/test_incremental_embedding.py
(same drained result set), and the slim shape itself is asserted in
tests/test_plan_shapes.py (no token/vector arrays in the exploded join).

Delivery semantics: foreachBatch is at-least-once on restart. Matches
are append-only facts (a replayed batch re-appends the same rows —
dedup them downstream on (id, accepted_id) if the sink must be
exactly-once); ``emit="kept"`` replays are likewise idempotent row sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def streaming_incremental_dedup(
    arriving: DataFrame,
    index: DataFrame,
    profile: DataFrame,
    output_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 12,
    bands: int = 3,
    threshold: float = 0.5,
    emit: str = "kept",
    within_batch: bool = True,
    query_name: str = "streaming_incremental_dedup",
    checkpoint_dir: str | None = None,
):
    """Drive a document stream through ingest-time MinHash near-dup
    dedup via the slim batch path, one micro-batch at a time.

    ``emit="kept"`` appends the documents that survive (no verified
    near-dup in the accepted corpus; larger-id side of within-batch
    pairs dropped when ``within_batch``) — the streaming form of
    :func:`~..operators.dedup.incremental_minhash_dedup`, which the
    direct stream plan cannot express at all (its anti-joins derive
    from the batch itself). ``emit="matches"`` appends the verified
    ``(doc_id, accepted_id, jaccard)`` pairs — same result set as the
    direct streaming form of ``incremental_minhash_matches``, minus its
    ride-through payload duplication.

    ``index``/``profile`` are the persisted corpus tables
    (:func:`~..operators.dedup.minhash_corpus_index` /
    :func:`~..operators.dedup.token_profile`); they stay static for the
    life of the query. Returns the started StreamingQuery.
    """
    from ..operators.dedup import (
        incremental_minhash_dedup,
        incremental_minhash_matches,
    )

    if emit not in ("kept", "matches"):
        raise ValueError(f"unknown emit mode {emit!r}")

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if emit == "matches":
            out = incremental_minhash_matches(
                batch_df, index, profile, id_col, text_col,
                num_hashes, bands, threshold,
            )
        else:
            out = incremental_minhash_dedup(
                batch_df, index, profile, id_col, text_col,
                num_hashes, bands, threshold, within_batch=within_batch,
            )
        out.write.mode("append").parquet(output_path)

    writer = arriving.writeStream.foreachBatch(_fold).queryName(query_name)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def streaming_incremental_embedding_dedup(
    arriving: DataFrame,
    index: DataFrame,
    corpus_vectors: DataFrame,
    output_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    num_planes: int = 4,
    num_tables: int = 4,
    dim: int = 64,
    emit: str = "kept",
    within_batch: bool = True,
    query_name: str = "streaming_incremental_embedding_dedup",
    checkpoint_dir: str | None = None,
):
    """Embedding twin of :func:`streaming_incremental_dedup`: folds each
    micro-batch of arriving vectors through the slim batch path of
    :func:`~..operators.ann.incremental_embedding_dedup` (``emit="kept"``)
    or :func:`~..operators.ann.incremental_embedding_matches`
    (``emit="matches"``), appending results to a parquet sink.
    ``index`` is the persisted :func:`~..operators.ann.lsh_corpus_index`
    (``num_planes``/``num_tables`` MUST match its build). Returns the
    started StreamingQuery."""
    from ..operators.ann import (
        incremental_embedding_dedup,
        incremental_embedding_matches,
    )

    if emit not in ("kept", "matches"):
        raise ValueError(f"unknown emit mode {emit!r}")

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if emit == "matches":
            out = incremental_embedding_matches(
                batch_df, index, corpus_vectors, id_col, vec_col,
                threshold, num_planes, num_tables, dim,
            )
        else:
            out = incremental_embedding_dedup(
                batch_df, index, corpus_vectors, id_col, vec_col,
                threshold, num_planes, num_tables, dim,
                within_batch=within_batch,
            )
        out.write.mode("append").parquet(output_path)

    writer = arriving.writeStream.foreachBatch(_fold).queryName(query_name)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
