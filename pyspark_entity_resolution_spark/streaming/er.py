"""Streaming entity resolution: the reference's blocking + matching
semantics over live record streams.

The reference's batch pipeline (SURVEY.md §2: P6-P9, G4) blocks records
into candidate pairs and scores them with venue/Levenshtein/Jaccard
predicates. These operators run the SAME match predicates incrementally:
records arrive on a watermarked stream, candidate pairs form via a
stream-stream equi-join on the block key bounded by an event-time
interval, and matches emit as soon as both sides are present.

Scale design: the join state shards by the equi-join block key across
executors, and the watermark + interval condition let Spark evict
buffered rows once no future match can land — state is bounded by
``watermark + within`` per key regardless of stream length. Everything is
built-in stream-stream join machinery; the match predicates are the exact
Column expressions the batch pipeline uses (functions/similarity.py), so
batch and streaming agree row-for-row on the same data (tested against
the batch twin in tests/test_streaming_er.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def streaming_candidate_pairs(
    left: DataFrame,
    right: DataFrame,
    block_cols: list[str],
    ts_col: str = "ts",
    within: str = "10 minutes",
    left_watermark: str = "30 minutes",
    right_watermark: str = "30 minutes",
    left_prefix: str = "a",
    right_prefix: str = "b",
) -> DataFrame:
    """Blocked candidate pairs from two record streams.

    Equi-join on ``block_cols`` (the blocking predicate — same role as the
    batch exploded-block-key join, operators/blocking.py) restricted to
    right-side records whose event time falls in
    ``[left.ts, left.ts + within]``. Output columns are prefixed
    ``{left_prefix}_`` / ``{right_prefix}_``; the block columns keep both
    prefixed copies so downstream predicates can reference either side.
    """
    l, r = left_prefix, right_prefix
    lw = left.withWatermark(ts_col, left_watermark).select(
        *[F.col(c).alias(f"{l}_{c}") for c in left.columns]
    )
    rw = right.withWatermark(ts_col, right_watermark).select(
        *[F.col(c).alias(f"{r}_{c}") for c in right.columns]
    )
    cond = F.lit(True)
    for c in block_cols:
        cond = cond & (F.col(f"{l}_{c}") == F.col(f"{r}_{c}"))
    cond = (
        cond
        & (F.col(f"{r}_{ts_col}") >= F.col(f"{l}_{ts_col}"))
        & (
            F.col(f"{r}_{ts_col}")
            <= F.col(f"{l}_{ts_col}") + F.expr(f"INTERVAL {within}")
        )
    )
    return lw.join(rw, cond, "inner")


def streaming_match_documents(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    block_cols: list[str] = ("lang", "source"),
    within: str = "10 minutes",
    watermark: str = "30 minutes",
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Streaming near-duplicate document matching — the flagship batch
    query's (er_flagship_doc_matching) streaming twin.

    Blocks on ``block_cols``, bounds pairs to an event-time interval, and
    applies the batch token-set Jaccard threshold. Emits
    ``(a_id, b_id, a_ts, b_ts, jaccard)`` incrementally. Self-match rows
    (same id) are excluded; pass the same stream twice for self-matching.
    """
    from ..functions.similarity import token_jaccard

    pairs = streaming_candidate_pairs(
        left,
        right,
        block_cols=list(block_cols),
        ts_col=ts_col,
        within=within,
        left_watermark=watermark,
        right_watermark=watermark,
    )
    jac: Column = token_jaccard(f"a_{text_col}", f"b_{text_col}")
    return (
        pairs.filter(F.col(f"a_{id_col}") != F.col(f"b_{id_col}"))
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= min_jaccard)
        .select(
            F.col(f"a_{id_col}").alias("a_id"),
            F.col(f"b_{id_col}").alias("b_id"),
            F.col(f"a_{ts_col}").alias("a_ts"),
            F.col(f"b_{ts_col}").alias("b_ts"),
            "jaccard",
        )
    )


def streaming_match_publications(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    within: str = "10 minutes",
    watermark: str = "30 minutes",
    venues: list[str] | None = None,
    max_levenshtein: int = 10,
    min_jaccard: float = 0.6,
) -> DataFrame:
    """Streaming twin of the batch publication matcher
    (operators/matching.py score_and_match): block on ``year``, then the
    reference's exact predicate chain — venue agreement, bounded author
    Levenshtein, three-band match rule, title Jaccard threshold.

    Inputs are cleaned publication streams with at least
    (id, title, authors, year, venue, num_authors, ts). Emits matched
    pairs with the batch matcher's column contract
    (a_id, b_id, scores, title_jaccard_sim).
    """
    from ..functions.similarity import both_contain, match_rule, token_jaccard
    from ..operators.matching import DEFAULT_VENUES

    venues = DEFAULT_VENUES if venues is None else venues
    pairs = streaming_candidate_pairs(
        left,
        right,
        block_cols=["year"],
        ts_col=ts_col,
        within=within,
        left_watermark=watermark,
        right_watermark=watermark,
    )
    scores = F.levenshtein("a_authors", "b_authors", max_levenshtein - 1)
    return (
        pairs.filter(both_contain("a_venue", "b_venue", venues))
        .withColumn("scores", scores)
        .filter(F.col("scores") >= 0)
        .filter(match_rule("scores", "a_num_authors", "b_num_authors", max_levenshtein))
        .withColumn("title_jaccard_sim", token_jaccard("a_title", "b_title"))
        .filter(F.col("title_jaccard_sim") >= min_jaccard)
        .select(
            "a_id", "b_id", "scores", "title_jaccard_sim",
            F.col(f"a_{ts_col}").alias("a_ts"),
            F.col(f"b_{ts_col}").alias("b_ts"),
        )
    )


# ------------------------------------------ incremental entity emission --

def _node_bucket(n_buckets: int) -> Column:
    """Stable hash bucket of a node key — the label-store partition
    column. MUST be computed identically every batch (xxhash64 is
    seed-stable across sessions)."""
    return F.pmod(F.xxhash64(F.col("node")), F.lit(n_buckets)).cast("int")


@dataclass
class FoldReport:
    """What one incremental fold did — returned by
    :func:`incremental_entity_labels` so observability is the
    function's contract, not a process global.

    ``labels`` is the full current label table (``node, component``) —
    the value pre-r6 callers received directly. ``expansion_buckets``
    is the bucket list the member expansion was pruned to (``None`` on
    a full-store fallback: index absent/behind, or a cold start).
    ``expansion_plan`` is the formatted physical plan of the executed
    expansion scan (its ``PartitionFilters`` line shows the pruning) —
    a string, never a live DataFrame, because the fold's dynamic
    overwrite replaces the scanned files and re-executing such a plan
    after the fold would read deleted files. ``n_hit_components``
    counts the previously-known components this batch touched
    (``None`` on cold start or when the index was absent — the fold
    then never needed the number). ``written_buckets`` is the sorted
    bucket list this fold actually rewrote (changed rows only — the
    r6 diff-based write; ``None`` on cold start, where every bucket is
    laid down)."""

    labels: DataFrame
    expansion_buckets: list[int] | None = None
    expansion_plan: str | None = None
    n_hit_components: int | None = None
    cold_start: bool = False
    written_buckets: list[int] | None = None


def _lease_path(spark, labels_path: str):
    """Sibling writer-lease marker of a label store (outside the store
    directory so a cold-start full overwrite cannot delete it
    mid-write)."""
    return spark._jvm.org.apache.hadoop.fs.Path(
        labels_path.rstrip("/") + "__lease"
    )


def _acquire_store_lease(spark, labels_path: str, owner: str):
    """Create-exclusive writer lease for the label store. The store's
    write protocol (index-ahead ordering, dynamic partition overwrite,
    compaction's read-then-replace) is SINGLE-WRITER: two concurrent
    writers would silently corrupt buckets. ``foreachBatch`` already
    serializes fold+compact inside one streaming query; this lease
    extends the guarantee to direct callers in other processes.
    Returns the filesystem handle for :func:`_release_store_lease`;
    raises RuntimeError when another writer holds the lease. A lease
    left behind by a crashed writer must be cleared explicitly with
    :func:`break_store_lease` — a deliberate manual step, since only
    an operator can know the other writer is truly gone.

    Atomicity rests on Hadoop-FS ``create(path, overwrite=False)``
    (create-exclusive); that this primitive actually excludes across
    SEPARATE JVMs on the local filesystem — not merely across threads
    of one session — is proven by racing real processes in
    tests/test_streaming_er.py::test_lease_mutual_exclusion_across_processes."""
    import json as _json
    import os as _os
    import time as _time

    jpath = _lease_path(spark, labels_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    try:
        out = fs.create(jpath, False)  # overwrite=False: create-exclusive
    except Exception as exc:  # Hadoop FileAlreadyExistsException et al.
        if fs.exists(jpath):
            raise RuntimeError(
                f"label store at {labels_path} is locked by another "
                f"writer (lease file {jpath}): a fold and a compaction "
                "must not run concurrently — wait for the other writer, "
                "or, if it crashed, clear the stale lease with "
                "break_store_lease()"
            ) from None
        raise exc
    try:
        out.write(
            bytearray(
                _json.dumps(
                    {"owner": owner, "pid": _os.getpid(), "ts": _time.time()}
                ).encode()
            )
        )
    finally:
        out.close()
    return fs


def _acquire_store_lease_retry(
    spark, labels_path: str, owner: str, lease_wait: float
):
    """Bounded wait-and-backoff around the create-exclusive lease, for
    the BENIGN contention case: a fold arriving while a compaction (or
    another fold) briefly holds the store. Retries acquisition with
    exponential backoff until ``lease_wait`` seconds have elapsed, then
    re-raises the final RuntimeError — a stale lease from a crashed
    writer still surfaces (after the bounded wait) and still requires
    the deliberate :func:`break_store_lease`. Each attempt is the same
    atomic create-exclusive as the direct path; waiting never peeks or
    pre-deletes, so there is no acquire race."""
    import time as _time

    deadline = _time.monotonic() + lease_wait
    backoff = 0.05
    while True:
        try:
            return _acquire_store_lease(spark, labels_path, owner)
        except RuntimeError:
            remaining = deadline - _time.monotonic()
            if remaining <= 0:
                raise
            _time.sleep(min(backoff, remaining))
            backoff = min(backoff * 2, 1.0)


def _release_store_lease(spark, labels_path: str, fs) -> None:
    fs.delete(_lease_path(spark, labels_path), False)


def break_store_lease(spark, labels_path: str) -> bool:
    """Forcibly clear a label-store writer lease (after a writer crash).
    Returns True if a lease file was removed."""
    jpath = _lease_path(spark, labels_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.delete(jpath, False))


def _cidx_path(labels_path: str) -> str:
    """Sibling directory of the label store holding the component->bucket
    index: one row per distinct ``(component, bucket)`` pair, partitioned
    by ``bucket`` exactly like the store itself. The index is what makes
    member expansion O(touched components): it answers "which buckets
    hold members of these components" without scanning node rows."""
    return labels_path.rstrip("/") + "__cidx"


def _meta_path(spark, labels_path: str):
    jvm = spark._jvm
    return jvm.org.apache.hadoop.fs.Path(
        labels_path.rstrip("/") + "/_store_meta.json"
    )


def _write_store_meta(spark, labels_path: str, n_buckets: int) -> None:
    """Record the store's immutable layout (``n_buckets``) in an
    underscore-prefixed sidecar file INSIDE the store directory —
    Spark's file listing ignores ``_``-files, the dynamic partition
    overwrite never touches non-partition paths, and every later
    fold/lookup/compaction can verify its caller-supplied ``n_buckets``
    against the layout instead of silently pruning to wrong buckets.

    Written ATOMICALLY (temp name, then rename into place): a crash
    mid-write must not leave a truncated sidecar that would make every
    later fold/lookup die parsing it. Rename is atomic on HDFS and
    local filesystems; on object stores it degrades to copy+delete,
    where the read side's unreadable-sidecar tolerance
    (:func:`_check_store_meta`) is the backstop."""
    import json as _json

    jvm = spark._jvm
    jpath = _meta_path(spark, labels_path)
    jtmp = jvm.org.apache.hadoop.fs.Path(
        labels_path.rstrip("/") + "/_store_meta.json.tmp"
    )
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(jtmp, True)
    try:
        out.write(bytearray(_json.dumps({"n_buckets": n_buckets}).encode()))
    finally:
        out.close()
    fs.delete(jpath, False)  # rename won't clobber an existing file
    fs.rename(jtmp, jpath)


def _check_store_meta(spark, labels_path: str, n_buckets: int) -> None:
    """Raise with a clear message when the caller's ``n_buckets``
    contradicts the store's recorded layout (a mismatch would compute
    wrong bucket ids: folds would mis-place rows and lookups would
    silently return nothing). Stores predating the sidecar pass."""
    import json as _json

    jpath = _meta_path(spark, labels_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return
    try:
        stream = fs.open(jpath)
        try:
            data = bytes(
                spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            )
        finally:
            stream.close()
        recorded = _json.loads(data.decode())["n_buckets"]
    except Exception:
        # an unreadable sidecar — truncated JSON or a failing read
        # (e.g. a checksum mismatch after a torn write on a store
        # predating the atomic rename, or a non-atomic object store).
        # The evidence file is gone, so the STORE ITSELF is the layout
        # authority now, not the caller: the ``bucket=`` partition
        # directories bound n_buckets from below, and each stored row
        # must satisfy ``bucket == pmod(xxhash64(node), n_buckets)``.
        # Only after the store corroborates the caller's value do we
        # re-stamp the sidecar; a contradicted value raises instead of
        # silently mis-bucketing every later fold/lookup.
        counts = _bucket_file_counts(spark, labels_path)
        # buckets with zero data files (e.g. a compaction crashed
        # mid-replace) carry no evidence — drop them or the row-hash
        # scan below dies in schema inference on an all-empty store
        observed = sorted(b for b, c in counts.items() if c > 0)
        if not observed:
            # empty/absent store: nothing to contradict the caller
            _write_store_meta(spark, labels_path, n_buckets)
            return
        if max(observed) >= n_buckets:
            raise ValueError(
                f"label store at {labels_path} has an unreadable "
                f"layout sidecar AND a bucket={max(observed)} partition "
                f"that cannot exist under the caller's "
                f"n_buckets={n_buckets} — the caller's layout is wrong; "
                "rebuild the sidecar with the store's true n_buckets"
            )
        # dir names bound only from below (true=64 / caller=32 passes
        # when no row landed past bucket 31), so re-derive each row's
        # bucket under the caller's layout and compare with the stored
        # partition value. One projection-only scan, on this rare
        # recovery path only; limit(1) lets Spark stop at the first
        # contradiction.
        store = spark.read.parquet(labels_path)
        contradiction = store.filter(
            _node_bucket(n_buckets) != F.col("bucket").cast("int")
        ).limit(1)
        if contradiction.isEmpty():
            _write_store_meta(spark, labels_path, n_buckets)  # healed
            return
        raise ValueError(
            f"label store at {labels_path} has an unreadable layout "
            f"sidecar and its rows do not hash to their buckets under "
            f"the caller's n_buckets={n_buckets} — the caller's layout "
            "is wrong; rebuild the sidecar with the store's true "
            "n_buckets"
        )
    if recorded != n_buckets:
        raise ValueError(
            f"label store at {labels_path} is laid out with "
            f"n_buckets={recorded}, but the caller passed "
            f"n_buckets={n_buckets} — the layout is immutable for the "
            f"lifetime of a store (rebuild the store to change it)"
        )


def _write_component_index(labels: DataFrame, cidx_path: str, dynamic: bool) -> None:
    """(Re)write component->bucket index rows. ``labels`` must carry
    (component, bucket); with ``dynamic=True`` only the partitions
    present in ``labels`` are replaced (per-fold maintenance), otherwise
    the whole index is laid down (cold start / migration)."""
    writer = (
        labels.select("component", "bucket").distinct()
        .write.mode("overwrite")
    )
    if dynamic:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.partitionBy("bucket").parquet(cidx_path)


def incremental_entity_labels(
    spark,
    labels_path: str,
    new_matches: DataFrame,
    left_id: str = "a_id",
    right_id: str = "b_id",
    left_name: str = "a",
    right_name: str = "b",
    n_buckets: int = 64,
    lease_wait: float = 0.0,
) -> DataFrame:
    """Fold one batch of matched pairs into the persistent entity labels.

    Incremental connected components WITHOUT replaying history: the
    previous ``(node, component)`` labels of components TOUCHED by this
    batch re-enter the graph as star edges (every member points at its
    component root, itself a member node), new match edges are unioned
    in, and CC runs over that compressed subgraph — per-batch compute is
    O(touched components + new edges), not O(all historical matches).
    Component ids stay batch-identical (min member key): the old id is
    the min of its prior members, so the min over merged stars equals
    the min over the full history.

    The label store is parquet HASH-BUCKETED on the node key
    (``bucket = pmod(xxhash64(node), n_buckets)``, a partition column),
    and each batch rewrites ONLY buckets containing CHANGED rows (new
    nodes, plus members of component ids retired by a merge — members
    of a surviving component keep byte-identical rows because the id is
    the min member key) via dynamic partition overwrite. Per-batch
    write cost is therefore O(changed-node buckets × bucket size), not
    O(touched-component member count): one new member of a million-row
    component rewrites one bucket, not the component's full scatter.
    Unrewritten bucket files are left byte-identical on disk. SIZING:
    node hashes scatter, so a batch with k changed nodes touches
    ~min(k, n_buckets) buckets — keep ``n_buckets`` well above the
    expected per-batch changed-node count or every fold pays
    ~n_buckets × bucket size (the whole store) in carried rewrites;
    bucket size (rows / n_buckets) sets the per-fold cost floor.
    ``n_buckets`` must stay constant for the lifetime of a store (it
    defines the layout); a store written by the pre-bucketed flat
    layout is migrated wholesale on its first fold.

    READS are bucket-pruned symmetrically via a component->bucket side
    index (``{labels_path}__cidx``: one tiny row per distinct
    (component, bucket) pair, partitioned by bucket like the store):
    the node probe prunes to the batch nodes' own buckets, and member
    expansion reads only the buckets the index lists for the hit
    components — per-batch read is O(touched components), matching the
    write's O(touched buckets). Index maintenance rides the same
    dynamic partition overwrite (touched buckets only). Crash safety:
    the index is written BEFORE the store each fold, so after a crash
    between the two writes the index is at most AHEAD of the store —
    a component id the interrupted fold retired is then absent from
    the index, which the fold detects and answers with one
    full-store expansion (ids keep their pre-fold buckets listed,
    because member sets only grow, so a present id's bucket list is
    always a superset of its true buckets); a store with no index yet
    (pre-index layout) takes the same full-scan path once and builds
    the index after its fold.

    Node identity is namespaced ``{side}:{id}`` exactly like the batch
    operator (operators/clustering.py cluster_matched_pairs), so drained
    streaming labels are comparable row-for-row with the batch entity
    table. Re-delivered pairs (foreachBatch is at-least-once on restart)
    are idempotent: an edge already inside one component changes nothing.

    Returns a :class:`FoldReport`; its ``labels`` field is the FULL
    current label table (touched rows from this fold plus untouched
    rows; the untouched-bucket portion is read lazily from files this
    fold did not rewrite).

    SINGLE-WRITER: the whole fold runs under the store's writer lease
    (see :func:`_acquire_store_lease`) — a concurrent fold or
    compaction from another process raises instead of corrupting
    buckets. ``lease_wait`` (seconds, default 0 = fail fast) bounds a
    wait-and-backoff retry for the BENIGN case — e.g. a compaction
    finishing as this fold arrives — so callers need no hand-rolled
    retry loop; a lease still held past the wait raises as before.
    """
    from pyspark.errors import AnalysisException

    from ..operators.clustering import connected_components

    _check_store_meta(spark, labels_path, n_buckets)
    fs = _acquire_store_lease_retry(
        spark, labels_path, "incremental_entity_labels", lease_wait
    )
    try:
        return _fold_locked(
            spark, labels_path, new_matches, left_id, right_id,
            left_name, right_name, n_buckets, AnalysisException,
            connected_components,
        )
    finally:
        _release_store_lease(spark, labels_path, fs)


def _fold_locked(
    spark, labels_path, new_matches, left_id, right_id,
    left_name, right_name, n_buckets, AnalysisException,
    connected_components,
) -> FoldReport:
    edges = new_matches.select(
        F.concat(F.lit(left_name + ":"), F.col(left_id).cast("string")).alias("src"),
        F.concat(F.lit(right_name + ":"), F.col(right_id).cast("string")).alias("dst"),
    )
    try:
        prev = spark.read.parquet(labels_path)
    except AnalysisException:
        prev = None  # cold start: no labels yet

    if prev is None or "bucket" not in prev.columns:
        # cold start (or one-time migration from the flat layout): every
        # node is touched; static overwrite lays down the bucketed store
        if prev is not None:
            edges = edges.unionByName(
                prev.select(
                    F.col("node").alias("src"), F.col("component").alias("dst")
                )
            )
        labels = connected_components(edges).localCheckpoint()
        bucketed = labels.withColumn("bucket", _node_bucket(n_buckets))
        bucketed.write.mode("overwrite").partitionBy("bucket").parquet(
            labels_path
        )
        _write_store_meta(spark, labels_path, n_buckets)
        _write_component_index(bucketed, _cidx_path(labels_path), dynamic=False)
        return FoldReport(labels=labels, cold_start=True)

    # --- incremental fold against the bucketed store -----------------
    batch_nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    # components this batch touches, then ALL their member rows (a merge
    # relabels both components wholesale). The node lookup PRUNES to the
    # batch nodes' own buckets: the bucket values are collected (at most
    # n_buckets small ints — driver-safe by construction) and applied as
    # a static isin filter on the partition column, so the scan reads
    # only those directories instead of the whole store.
    batch_buckets = batch_nodes.withColumn("bucket", _node_bucket(n_buckets))
    probe_buckets = [
        r.bucket for r in batch_buckets.select("bucket").distinct().collect()
    ]
    hit_components = (
        prev.filter(F.col("bucket").isin(probe_buckets))
        .join(batch_buckets, on=["bucket", "node"], how="inner")
        .select("component")
        .distinct()
        # reused by the index probe, the bucket-pruned expansion, and
        # (on fallback) the full expansion — materialize once
        .localCheckpoint()
    )
    # member expansion, bucket-pruned through the component->bucket
    # index: collect the (<= n_buckets) bucket ids holding members of
    # hit components and read only those directories. Fall back to one
    # full-store expansion when the index is absent (pre-index store) or
    # does not know every hit component (crash between the index and
    # store writes of a previous fold — see the docstring's crash-safety
    # contract).
    try:
        cidx = spark.read.parquet(_cidx_path(labels_path))
    except AnalysisException:
        cidx = None
    member_buckets, n_hit = None, None
    if cidx is not None:
        # ONE action answers all three probe questions (how many hit
        # components, how many the index knows, which buckets): marker
        # rows for the hit components ride a unionByName next to the
        # inner-join result, so the former extra hit_components.count()
        # round trip is folded into this aggregation. The big cidx side
        # keeps its broadcast-inner-join shape.
        hits_with_buckets = cidx.join(
            F.broadcast(hit_components), on="component", how="inner"
        )
        probe = (
            hits_with_buckets.select(
                "component", "bucket", F.lit(False).alias("__marker")
            )
            .unionByName(
                hit_components.select(
                    "component",
                    F.lit(None).cast(cidx.schema["bucket"].dataType).alias("bucket"),
                    F.lit(True).alias("__marker"),
                )
            )
            .agg(
                F.count_distinct(
                    F.when(F.col("__marker"), F.col("component"))
                ).alias("n_hit"),
                F.count_distinct(
                    F.when(~F.col("__marker"), F.col("component"))
                ).alias("known"),
                F.collect_set("bucket").alias("buckets"),  # nulls ignored
            )
            .collect()[0]
        )
        n_hit = probe["n_hit"]
        if probe["known"] == n_hit:
            member_buckets = probe["buckets"]
    scan = (
        prev
        if member_buckets is None
        else prev.filter(F.col("bucket").isin([int(b) for b in member_buckets]))
    )
    expansion_buckets = (
        None if member_buckets is None else sorted(int(b) for b in member_buckets)
    )
    # the plan STRING is captured for the report (PartitionFilters show
    # the pruning); the live scan DataFrame is deliberately not exposed
    # — after the dynamic overwrite below its captured file listing
    # points at deleted files
    expansion_plan = scan._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    members = scan.join(hit_components, on="component", how="left_semi")
    star = members.select(
        F.col("node").alias("src"), F.col("component").alias("dst")
    )
    new_labels = connected_components(edges.unionByName(star))  # eager ckpt

    # DIFF-BASED WRITE (r6): rewrite only buckets holding rows whose
    # label actually CHANGED, not every bucket holding any member of a
    # touched component. Node-hash bucketing scatters a component's
    # members across ~min(members, n_buckets) buckets, so the previous
    # all-members rewrite made ONE new member of a large component
    # rewrite nearly the whole store (measured x27 fold cost at a x100
    # store in `scale_probe.py century-labelstore`). The common fold
    # changes almost nothing: a component's id is the MIN member key,
    # so members of a surviving component keep byte-identical rows, and
    # only (a) brand-new nodes and (b) members of RETIRED (merged-away)
    # component ids differ. `members` is exactly the prior rows of
    # every node whose label could change (batch nodes not in it are
    # new), so one left join against it classifies each new_labels row.
    # Index invariants survive unchanged: a retired id's members ALL
    # change, so every bucket listing it is rewritten (purging it), and
    # unrewritten index buckets stay valid because their store buckets
    # are untouched; a surviving id keeps its (superset-safe) listings.
    changed = (
        new_labels.join(
            members.select("node", F.col("component").alias("__old")),
            on="node",
            how="left",
        )
        .filter(F.col("__old").isNull() | (F.col("__old") != F.col("component")))
        .select("node", "component")
    )
    # materialize the (small) changed set once: its bucket ids drive a
    # STATIC partition filter for the carried read (the same
    # collect-then-isin pattern as the node probe above — join-based
    # pruning would hinge on DPP firing), and both writes re-read it.
    # Bisected against the alternatives (one fused write-set checkpoint:
    # 52 fold jobs; a lazy `changed` evaluated by the collect and the
    # checkpoint separately: 53) — checkpoint-then-collect is the
    # cheapest shape at 50
    changed = changed.withColumn(
        "bucket", _node_bucket(n_buckets)
    ).localCheckpoint()
    written_buckets = sorted(
        r.bucket for r in changed.select("bucket").distinct().collect()
    )
    # rows that share a rewritten bucket but are not themselves changed
    # must ride along (partition-granularity overwrite); materialized
    # BEFORE their files are overwritten
    carried = (
        prev.filter(F.col("bucket").isin(written_buckets))
        .join(changed.select("node"), on="node", how="left_anti")
        .select("node", "component", "bucket")
        .localCheckpoint()
    )
    to_write = changed.unionByName(carried)
    # index first, store second (inputs are checkpointed, so the two
    # writes see identical rows): a crash between them leaves the index
    # ahead of the store, the recoverable direction — see docstring. A
    # pre-index store instead rebuilds the whole index after its fold.
    if cidx is not None:
        _write_component_index(to_write, _cidx_path(labels_path), dynamic=True)
    to_write.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("bucket").parquet(labels_path)
    jmeta = _meta_path(spark, labels_path)
    if not jmeta.getFileSystem(spark._jsc.hadoopConfiguration()).exists(jmeta):
        # upgrade a pre-sidecar store in place (the check above already
        # accepted this fold's n_buckets as the layout)
        _write_store_meta(spark, labels_path, n_buckets)
    if cidx is None:
        _write_component_index(
            spark.read.parquet(labels_path), _cidx_path(labels_path),
            dynamic=False,
        )

    # full current table via a FRESH post-write read: the pre-write
    # `prev` plan captured a file listing whose touched-bucket files the
    # dynamic overwrite just replaced, so re-using it would read deleted
    # files; a new read lists the store as it now is
    return FoldReport(
        labels=spark.read.parquet(labels_path).select("node", "component"),
        expansion_buckets=expansion_buckets,
        expansion_plan=expansion_plan,
        n_hit_components=n_hit,
        written_buckets=written_buckets,
    )


def _bucket_file_counts(spark, path: str) -> dict[int, int]:
    """Per-bucket parquet data-file counts of a bucket-partitioned store,
    via the Hadoop FileSystem API (storage-agnostic: local, HDFS, S3A).
    Returns {} for a store that does not exist yet."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return {}
    counts: dict[int, int] = {}
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("bucket=")):
            continue
        counts[int(name.split("=", 1)[1])] = sum(
            1
            for f in fs.listStatus(st.getPath())
            if f.getPath().getName().endswith(".parquet")
        )
    return counts


def compact_label_store(
    spark,
    labels_path: str,
    max_files_per_bucket: int = 8,
    include_index: bool = True,
    lease_wait: float = 0.0,
) -> list[int]:
    """Rewrite-coalesce label-store buckets whose data-file count exceeds
    ``max_files_per_bucket``, down to ~one file per bucket. Returns the
    compacted bucket ids (label store; the index compacts silently).

    Every fold's dynamic partition overwrite can emit one file per task
    per touched bucket, so hot buckets accumulate small files between
    folds and slow the full-table read. Compaction is row-lossless: the
    over-threshold buckets are read, materialized (their files are about
    to be replaced), repartitioned so each bucket lands in one task, and
    dynamically overwritten in place — untouched buckets keep their
    files byte-identical. Safe to run between folds (same writer path,
    same layout); schedule it via ``streaming_resolve_entities``'s
    ``compact_every`` or call it directly. ``lease_wait`` bounds a
    wait-and-backoff retry on the writer lease for benign contention
    (a fold finishing as the compaction arrives); default 0 fails
    fast, as before.

    SINGLE-WRITER: compaction runs under the same writer lease as the
    fold (:func:`_acquire_store_lease`) — compacting while a fold from
    another process is mid-flight would replace bucket files the fold
    is reading and double-write the ones it is writing.
    """
    fs = _acquire_store_lease_retry(
        spark, labels_path, "compact_label_store", lease_wait
    )
    try:
        return _compact_locked(
            spark, labels_path, max_files_per_bucket, include_index
        )
    finally:
        _release_store_lease(spark, labels_path, fs)


def _compact_locked(
    spark, labels_path, max_files_per_bucket, include_index
) -> list[int]:
    compacted: list[int] = []
    paths = [labels_path]
    if include_index:
        paths.append(_cidx_path(labels_path))
    for path in paths:
        counts = _bucket_file_counts(spark, path)
        over = sorted(b for b, n in counts.items() if n > max_files_per_bucket)
        if not over:
            continue
        rows = (
            spark.read.parquet(path)
            .filter(F.col("bucket").isin(over))
            .localCheckpoint()  # materialize before replacing source files
        )
        (
            rows.repartition(len(over), "bucket")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(path)
        )
        if path == labels_path:
            compacted = over
    return compacted


def streaming_resolve_entities(
    matches: DataFrame,
    labels_path: str,
    left_id: str = "a_id",
    right_id: str = "b_id",
    left_name: str = "a",
    right_name: str = "b",
    query_name: str = "streaming_entities",
    checkpoint_dir: str | None = None,
    n_buckets: int = 64,
    compact_every: int | None = None,
    max_files_per_bucket: int = 8,
    lease_wait: float = 0.0,
):
    """Drive a match-pair stream all the way to an entity table — the
    last batch capability the streaming twin lacked. Each micro-batch
    folds its pairs into the persistent labels via
    :func:`incremental_entity_labels` (foreachBatch: per-batch the graph
    is bounded, global state lives in the parquet label store, and a
    restarted query replays at-least-once into an idempotent fold).

    Returns the started StreamingQuery; read the entity table at any
    point with :func:`entity_table`.

    ``compact_every=N`` runs :func:`compact_label_store` after every Nth
    micro-batch so hot buckets don't accumulate small files across
    folds (threshold ``max_files_per_bucket``).

    ``lease_wait`` forwards to both writers: within one streaming query
    folds and compactions already serialize, but an EXTERNAL writer
    (an operator-run compaction in another process) would otherwise
    fail the micro-batch on its brief lease; a bounded wait rides it
    out. Default 0 keeps the fail-fast foreachBatch behavior.
    """

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        incremental_entity_labels(
            batch_df.sparkSession, labels_path, batch_df,
            left_id, right_id, left_name, right_name, n_buckets,
            lease_wait=lease_wait,
        )
        if compact_every and (batch_id + 1) % compact_every == 0:
            compact_label_store(
                batch_df.sparkSession, labels_path, max_files_per_bucket,
                lease_wait=lease_wait,
            )

    writer = matches.writeStream.foreachBatch(_fold).queryName(query_name)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def entity_table(spark, labels_path: str) -> DataFrame:
    """Current streaming entity table in the batch operator's column
    contract: ``(id, df_name, cluster_id)``."""
    split = F.split(F.col("node"), ":", 2)
    return spark.read.parquet(labels_path).select(
        split.getItem(1).alias("id"),
        split.getItem(0).alias("df_name"),
        F.col("component").alias("cluster_id"),
    )


def entity_lookup(
    spark,
    labels_path: str,
    node_keys: list[str],
    n_buckets: int = 64,
) -> DataFrame:
    """Point lookup into the bucketed label store: ``(node, component)``
    for the requested node keys (``"{side}:{id}"`` format), reading ONLY
    the bucket directories those keys hash into — the serving-path read
    (which entity does this record belong to?) touches O(len(keys))
    buckets, never the full store. ``n_buckets`` must match the store's
    layout, like every other fold parameter.

    The bucket ids are derived through Spark's own ``xxhash64`` (one
    tiny local-relation job over the requested keys, no reimplementation
    of the hash driver-side), then applied as a static partition filter.
    """
    _check_store_meta(spark, labels_path, n_buckets)
    keys_df = spark.createDataFrame(
        [(k,) for k in node_keys], "node string"
    ).withColumn("bucket", _node_bucket(n_buckets))
    buckets = sorted({r["bucket"] for r in keys_df.select("bucket").collect()})
    return (
        spark.read.parquet(labels_path)
        .filter(F.col("bucket").isin(buckets))
        .join(F.broadcast(keys_df.select("node")), on="node", how="left_semi")
        .select("node", "component")
    )
