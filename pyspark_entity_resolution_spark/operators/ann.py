"""Approximate-nearest-neighbor search over embedding columns.

Two strategies:

- :func:`brute_force_topk` — exact baseline: query x corpus join, cosine,
  per-query top-k via a rank window. At scale the corpus side stays
  partitioned and the (small) query side is broadcast, so the "cross
  join" is a broadcast nested loop over corpus partitions — linear in
  corpus size, fully parallel, no shuffle of the corpus.
- :func:`random_hyperplane_buckets` / :func:`lsh_topk` — the scale path:
  sign-of-projection LSH. Hyperplanes are derived deterministically from
  md5 (computed driver-side once, embedded as literals), every vector gets
  a small bucket signature, and search only touches same-bucket
  candidates — turning the O(|Q|x|C|) scan into an equi-join on the
  bucket key. Recall is tunable via number of planes / multi-probe.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import as_double, l2_norm, paired_cosine

# Query sides larger than this are NOT broadcast (a driver/executor OOM
# at scale); the join degrades to a partitioned cross join instead.
MAX_BROADCAST_QUERY_ROWS = 100_000

# Adaptive LSH sizing: aim for buckets of roughly this many vectors.
TARGET_BUCKET_SIZE = 1024


def choose_num_planes(
    corpus_rows: int, target_bucket_size: int = TARGET_BUCKET_SIZE
) -> int:
    """Plane count so that 2^planes buckets hold ~target_bucket_size
    vectors each. A fixed plane count degenerates at scale (16 buckets
    over 10^9 vectors -> ~6*10^7-vector buckets -> near-quadratic
    within-bucket scans); growing planes with log2(n) keeps the
    per-bucket candidate cost flat. Floor of 4 keeps small corpora from
    collapsing into 1-2 buckets."""
    import math

    if corpus_rows <= target_bucket_size:
        return 4
    return max(4, math.ceil(math.log2(corpus_rows / target_bucket_size)))


def hyperplanes(num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1]^dim.

    Component (p, d) comes from md5("{p}:{d}") — reproducible in any
    engine/language without a shared RNG.
    """
    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()
            v = int(h[:6], 16)  # 24 bits
            row.append(((v % 2001) - 1000) / 1000.0)
        planes.append(row)
    return planes


def _bucket_expr(vec_col: str, planes: list[list[float]]) -> Column:
    """Bucket signature: one sign bit per hyperplane, as a bit-string.

    Built as ONE ``F.expr`` call: the straightforward per-plane
    ``F.when(F.aggregate(F.zip_with(vec, F.lit(plane), ...)))`` form
    costs 64 ``lit`` round-trips per plane plus two lambda-function
    handshakes — ~2.3 s of driver time for the 16-plane multi-table
    build (profiled, r11) — while the parsed SQL below is the identical
    expression tree (same zip_with/aggregate fold, same 0.0 init, same
    ``>= 0`` sign test; value-pinned by tests/test_vectors_sql.py)."""
    vd = f"transform(`{vec_col}`, x -> cast(x as double))"
    bits = []
    for plane in planes:
        arr = "array(" + ", ".join(f"{v!r}D" for v in plane) + ")"
        dot_sql = (
            f"aggregate(zip_with({vd}, {arr}, (x, y) -> x * y), "
            f"0.0D, (acc, x) -> acc + x)"
        )
        bits.append(f"CASE WHEN {dot_sql} >= 0 THEN '1' ELSE '0' END")
    return F.expr("concat(" + ", ".join(bits) + ")")


def random_hyperplane_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    num_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Attach the LSH ``bucket`` column."""
    planes = hyperplanes(num_planes, dim)
    return df.withColumn("bucket", _bucket_expr(vec_col, planes))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    broadcast_queries: bool | None = None,
) -> DataFrame:
    """Exact cosine top-k: returns (query_id, neighbor_id, rank, cos_sim).

    Ties broken by neighbor id; self-matches excluded.

    ``broadcast_queries=None`` (default) probes the query side with a
    cheap limit-count and broadcasts only if it is at most
    ``MAX_BROADCAST_QUERY_ROWS`` — an oversized query set degrades to a
    partitioned cross join instead of OOMing the driver. Pass True/False
    to skip the probe when the caller already knows the size.
    """
    # norms once per ROW on the linear sides, not once per scored pair
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"),
        l2_norm(vec_col).alias("q_nrm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"),
        l2_norm(vec_col).alias("c_nrm"),
    )
    if broadcast_queries is None:
        # limit(N+1).count() early-exits the scan — O(threshold), not O(|Q|)
        probe = q.select("query_id").limit(MAX_BROADCAST_QUERY_ROWS + 1).count()
        broadcast_queries = probe <= MAX_BROADCAST_QUERY_ROWS
    q_side = F.broadcast(q) if broadcast_queries else q
    scored = (
        q_side
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", paired_cosine("q_vec", "c_vec", "q_nrm", "c_nrm"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("bigint").alias("rank"),
            F.round("cos_sim", 4).alias("cos_sim"),
        )
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    num_planes: int | None = None,
    dim: int = 64,
    num_tables: int = 1,
) -> DataFrame:
    """Bucketed ANN: candidates share an LSH bucket, then exact cosine
    top-k within candidates. The scan becomes an equi-join on ``bucket``.

    ``num_planes=None`` sizes the bucket space from the corpus row count
    (one planning-time count; see :func:`choose_num_planes`) so bucket
    occupancy stays ~TARGET_BUCKET_SIZE at any scale. Pass an explicit
    count for reproducible bucketing (the driver-contract query pins 4 to
    match its SQL oracle).

    ``num_tables=L > 1`` is the recall dial: L independent hash tables
    (disjoint plane sets), candidates unioned across tables — collision
    probability rises from p^b to 1-(1-p^b)^L for per-plane agreement p.
    Each side explodes to L (table, bucket) keys, so candidate cost
    scales ~L×; the join stays a hash equi-join on (table, bucket) and a
    pair-level dropDuplicates dedups multi-table collisions before
    scoring."""
    if num_planes is None:
        num_planes = choose_num_planes(corpus.count())
    if num_tables == 1:
        qb = random_hyperplane_buckets(queries, vec_col, num_planes, dim).select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"),
            l2_norm(vec_col).alias("q_nrm"), "bucket"
        )
        cb = random_hyperplane_buckets(corpus, vec_col, num_planes, dim).select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"),
            l2_norm(vec_col).alias("c_nrm"), "bucket"
        )
        cands = qb.join(cb, on="bucket")
    else:
        all_planes = hyperplanes(num_planes * num_tables, dim)
        tables = [
            all_planes[t * num_planes:(t + 1) * num_planes]
            for t in range(num_tables)
        ]
        keys = F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"), _bucket_expr(vec_col, planes).alias("bits")
                )
                for t, planes in enumerate(tables)
            ]
        )
        qb = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            l2_norm(vec_col).alias("q_nrm"),
            F.explode(keys).alias("bucket"),
        )
        cb = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            l2_norm(vec_col).alias("c_nrm"),
            F.explode(keys).alias("bucket"),
        )
        cands = qb.join(cb, on="bucket").dropDuplicates(["query_id", "neighbor_id"])
    scored = (
        cands
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", paired_cosine("q_vec", "c_vec", "q_nrm", "c_nrm"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("bigint").alias("rank"),
            F.round("cos_sim", 4).alias("cos_sim"),
        )
    )


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    threshold: float = 0.95,
) -> DataFrame:
    """Cosine near-duplicate pairs within blocks (embedding-space dedup)."""
    sides = df.select(
        F.col(id_col), F.col(vec_col), F.col(block_col).alias("block"),
        l2_norm(vec_col).alias("nrm"),
    )
    a = sides.select(
        F.col(id_col).alias("a_id"), F.col(vec_col).alias("a_vec"),
        F.col("nrm").alias("a_nrm"), "block"
    )
    b = sides.select(
        F.col(id_col).alias("b_id"), F.col(vec_col).alias("b_vec"),
        F.col("nrm").alias("b_nrm"), "block"
    )
    return (
        a.join(b, on="block")
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("cos_sim", paired_cosine("a_vec", "b_vec", "a_nrm", "b_nrm"))
        .filter(F.col("cos_sim") >= threshold)
        .select("a_id", "b_id", F.round("cos_sim", 4).alias("cos_sim"))
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid_vec",
    nprobe: int = 1,
    keep_norm: bool = False,
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its ``nprobe``
    nearest centroids (max cosine, ties to the lowest centroid id).

    ``nprobe=1`` (storage-side default) gives each vector exactly one
    inverted list; ``nprobe>1`` (query-side recall dial) emits one row
    per probed list. The centroid table is tiny and broadcast;
    assignment is a broadcast nested-loop scan + rank window — linear
    in corpus size.

    ``keep_norm=True`` retains the per-vector L2 norm as ``vec_norm``
    so downstream scoring (ivf_topk / ivf_topk_multi) reuses the fold
    already paid for here instead of re-running an array aggregate per
    row. An input that already carries a ``vec_norm`` (or the internal
    ``__vnrm``) column is rejected up front — renaming next to a
    same-named column would emit ambiguous duplicates that break the
    downstream joins.
    """
    clash = {"vec_norm", "__vnrm"} if keep_norm else {"__vnrm"}
    clash = clash.intersection(df.columns)
    if clash:
        raise ValueError(
            f"ivf_assign input already has column(s) {sorted(clash)}, "
            "which collide with the norm column this operator emits — "
            "rename or drop them first"
        )
    c = F.broadcast(
        centroids.select(
            F.col(centroid_id), F.col(centroid_vec),
            l2_norm(centroid_vec).alias("__cnrm"),
        )
    )
    scored = (
        df.withColumn("__vnrm", l2_norm(vec_col))
        .crossJoin(c)
        .withColumn(
            "__sim", paired_cosine(vec_col, centroid_vec, "__vnrm", "__cnrm")
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__sim").desc(), F.col(centroid_id)
    )
    ranked = (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= nprobe)
    )
    if keep_norm:
        ranked = ranked.withColumnRenamed("__vnrm", "vec_norm")
        return (
            ranked.drop("__rk", "__sim", "__cnrm", centroid_vec)
            .withColumnRenamed(centroid_id, "ivf_bucket")
        )
    return (
        ranked.drop("__rk", "__sim", "__vnrm", "__cnrm", centroid_vec)
        .withColumnRenamed(centroid_id, "ivf_bucket")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    nprobe: int = 1,
) -> DataFrame:
    """IVF-flat search: both sides are coarse-quantized and each query
    probes its ``nprobe`` nearest centroids' inverted lists — the full
    scan becomes an equi-join on ``ivf_bucket``. Corpus vectors keep a
    single list, so a (query, neighbor) pair can match through at most
    one probe and no dedup pass is needed; candidate cost scales
    ~nprobe×, recall rises with every extra list probed."""
    qa = ivf_assign(
        queries, centroids, id_col, vec_col, nprobe=nprobe, keep_norm=True
    ).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("vec_norm").alias("q_nrm"),
        "ivf_bucket",
    )
    ca = ivf_assign(corpus, centroids, id_col, vec_col, keep_norm=True).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("vec_norm").alias("c_nrm"),
        "ivf_bucket",
    )
    scored = (
        qa.join(ca, on="ivf_bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", paired_cosine("q_vec", "c_vec", "q_nrm", "c_nrm"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("bigint").alias("rank"),
            F.round("cos_sim", 4).alias("cos_sim"),
        )
    )


def ivf_topk_multi(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    nprobes: tuple[int, ...] = (1, 3),
) -> DataFrame:
    """IVF-flat search at SEVERAL nprobe settings in one plan, tagged by
    a ``nprobe`` column. Calling :func:`ivf_topk` once per setting would
    re-run the corpus-side coarse quantization — the broadcast scan over
    the ENTIRE corpus, the dominant cost at scale — once per call. Here
    both assignments happen once: the query side keeps its probe rank so
    each setting is a filter (``rank <= p``), and the corpus side is
    lazily checkpointed so every setting's equi-join reuses the same
    materialized inverted lists."""
    max_p = max(nprobes)
    c = F.broadcast(
        centroids.select(
            F.col("centroid_id"), F.col("centroid_vec"),
            l2_norm("centroid_vec").alias("__cnrm"),
        )
    )
    w_assign = Window.partitionBy(id_col).orderBy(
        F.col("__sim").desc(), F.col("centroid_id")
    )
    qa = (
        queries.withColumn("__vnrm", l2_norm(vec_col))
        .crossJoin(c)
        .withColumn(
            "__sim", paired_cosine(vec_col, "centroid_vec", "__vnrm", "__cnrm")
        )
        .withColumn("__rk", F.row_number().over(w_assign))
        .filter(F.col("__rk") <= max_p)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            F.col("__vnrm").alias("q_nrm"),
            F.col("centroid_id").alias("ivf_bucket"),
            F.col("__rk").alias("probe_rank"),
        )
    )
    ca = ivf_assign(corpus, centroids, id_col, vec_col, keep_norm=True).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("vec_norm").alias("c_nrm"),
        "ivf_bucket",
    ).localCheckpoint(eager=False)
    w = Window.partitionBy("nprobe", "query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    # one join + one cosine per candidate; a candidate found at probe
    # rank r belongs to every setting p >= r, so it fans out to those
    # settings with a cheap array filter + explode instead of one
    # join-and-score pass per setting
    settings = F.array(*[F.lit(p) for p in sorted(nprobes)])
    scored = (
        qa.join(ca, on="ivf_bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", paired_cosine("q_vec", "c_vec", "q_nrm", "c_nrm"))
        .withColumn(
            "nprobe",
            F.explode(
                F.filter(settings, lambda p: p >= F.col("probe_rank"))
            ),
        )
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "nprobe",
            "query_id",
            "neighbor_id",
            F.col("rank").cast("bigint").alias("rank"),
            F.round("cos_sim", 4).alias("cos_sim"),
        )
    )


def multiprobe_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    num_planes: int | None = None,
    dim: int = 64,
) -> DataFrame:
    """Multi-probe LSH: each query probes its own bucket PLUS every bucket
    at Hamming distance 1 (one sign bit flipped) — recall approaches the
    brute-force baseline at (num_planes+1)x the candidate cost, still an
    equi-join on the bucket key. Corpus vectors keep a single bucket, so
    a (query, neighbor) pair can match through at most one probe — no
    dedup pass needed.

    ``num_planes=None`` sizes the bucket space from the corpus row count
    (see :func:`choose_num_planes`)."""
    if num_planes is None:
        num_planes = choose_num_planes(corpus.count())
    qb = random_hyperplane_buckets(queries, vec_col, num_planes, dim)

    def flip(bucket: Column, i: int) -> Column:
        flipped = F.when(
            F.substring(bucket, i + 1, 1) == "1", F.lit("0")
        ).otherwise(F.lit("1"))
        return F.concat(
            F.substring(bucket, 1, i), flipped,
            F.substring(bucket, i + 2, num_planes - i - 1),
        )

    probes = F.array(
        F.col("bucket"), *[flip(F.col("bucket"), i) for i in range(num_planes)]
    )
    qprobed = qb.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(vec_col).alias("q_nrm"),
        F.explode(probes).alias("bucket"),
    )
    cb = random_hyperplane_buckets(corpus, vec_col, num_planes, dim).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"),
        l2_norm(vec_col).alias("c_nrm"), "bucket"
    )
    scored = (
        qprobed.join(cb, on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", paired_cosine("q_vec", "c_vec", "q_nrm", "c_nrm"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("bigint").alias("rank"),
            F.round("cos_sim", 4).alias("cos_sim"),
        )
    )


def embedding_near_duplicates_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    num_planes: int | None = None,
    num_tables: int = 4,
    dim: int = 64,
    corpus_rows: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs with NO blocking column —
    the unblocked scale path that :func:`embedding_near_duplicates`
    (label-blocked, all-pairs within block) cannot offer.

    Generate-then-verify: multi-table sign-of-projection LSH self-join
    proposes candidates (one hash equi-join per table, never an
    all-pairs scan), exact cosine verifies. Recall dial is
    ``num_tables`` (1 - (1 - p^planes)^tables); per-table bucket space
    grows with corpus size via :func:`choose_num_planes` so bucket
    occupancy — and with it the within-bucket candidate cost — stays
    flat at any scale.

    Exactly-once pair admission: a near-dup pair collides in MANY
    tables, so instead of pushing a tables-x-inflated pair stream
    through a dedup shuffle, each pair is admitted only at its FIRST
    colliding table (cheap per-row array comparison — same trick as the
    MinHash band join, operators/dedup.py).
    """
    # The corpus count drives BOTH the bucket-space sizing and the
    # broadcast-vs-copartition join shape below, so take it even when
    # the caller pinned num_planes (a count is one cheap job — often
    # answered from parquet footers — while the wrong join shape is a
    # measured 7x on the candidate join). Callers that already know the
    # size can pass corpus_rows to skip the job.
    if corpus_rows is None:
        corpus_rows = df.count()
    if num_planes is None:
        num_planes = choose_num_planes(corpus_rows)
    all_planes = hyperplanes(num_planes * num_tables, dim)
    keys = F.array(
        *[
            _bucket_expr(
                vec_col,
                all_planes[t * num_planes:(t + 1) * num_planes],
            )
            for t in range(num_tables)
        ]
    )
    # tiny (id, per-table keys, table, key) rows checkpoint; vectors join
    # back only for the verified candidate pairs. Table keys are
    # FLATTENED to scalar columns so the first-colliding-table admission
    # below is plain integer equality in whole-stage codegen — the array
    # form (exists(zip_with(slice(...)))) allocates three arrays per
    # JOIN ROW, which dominated the candidate join at scale (measured on
    # the MinHash twin of this plan, operators/dedup.py)
    keyed = df.select(F.col(id_col), keys.alias("keys")).localCheckpoint(
        eager=False
    )
    banded = keyed.select(
        F.col(id_col),
        *[F.element_at("keys", t + 1).alias(f"t{t}") for t in range(num_tables)],
        F.posexplode("keys").alias("tbl", "key"),
    ).localCheckpoint()
    # The banded rows are tiny in bytes but the self-join amplifies each
    # bucket quadratically, so stats-driven planning goes wrong two ways:
    # AQE's byte-based coalescing can run the join in 1-2 tasks (measured
    # 7x slower), and the byte-based broadcast decision flips with the
    # row layout. Pick the join shape from the planning-time corpus
    # count instead, when we have one:
    # - small banded side (the common interactive case): broadcast the
    #   build side explicitly — the probe keeps banded's even round-robin
    #   partitioning, immune to both bucket skew and coalescing.
    # - at scale (or unknown size): explicit co-partitioning on the join
    #   key; a user-specified repartition is exempt from AQE coalescing.
    a = banded.select(
        F.col(id_col).alias("a_id"),
        *[F.col(f"t{t}").alias(f"a_t{t}") for t in range(num_tables)],
        "tbl", "key",
    )
    b = banded.select(
        F.col(id_col).alias("b_id"),
        *[F.col(f"t{t}").alias(f"b_t{t}") for t in range(num_tables)],
        "tbl", "key",
    )
    broadcast_build = corpus_rows * num_tables <= 2_000_000
    if broadcast_build:
        b = F.broadcast(b)
    else:
        width = df.sparkSession.sparkContext.defaultParallelism
        a = a.repartition(width, "tbl", "key")
        b = b.repartition(width, "tbl", "key")
    earlier_table_collides = F.lit(False)
    for t in range(num_tables - 1):
        earlier_table_collides = earlier_table_collides | (
            (F.col("tbl") > F.lit(t)) & (F.col(f"a_t{t}") == F.col(f"b_t{t}"))
        )
    cands = (
        a.join(b, on=["tbl", "key"])
        .filter((F.col("a_id") < F.col("b_id")) & ~earlier_table_collides)
        .select("a_id", "b_id")
    )
    withn = df.select(
        F.col(id_col), F.col(vec_col), l2_norm(vec_col).alias("nrm")
    )
    va = withn.select(
        F.col(id_col).alias("a_id"), F.col(vec_col).alias("a_vec"),
        F.col("nrm").alias("a_nrm"),
    )
    vb = withn.select(
        F.col(id_col).alias("b_id"), F.col(vec_col).alias("b_vec"),
        F.col("nrm").alias("b_nrm"),
    )
    return (
        cands.join(va, on="a_id")
        .join(vb, on="b_id")
        .withColumn("cos_sim", paired_cosine("a_vec", "b_vec", "a_nrm", "b_nrm"))
        .filter(F.col("cos_sim") >= threshold)
        .select("a_id", "b_id", F.round("cos_sim", 4).alias("cos_sim"))
    )


# ------------------------------------- ingest-time embedding near-dup --

def lsh_corpus_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 4,
    num_tables: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Multi-table sign-LSH key index of an ACCEPTED embedding corpus —
    the vector twin of :func:`~.dedup.minhash_corpus_index`. One row per
    (vector, table), carrying every table's key as a flattened scalar
    column so the first-colliding-table admission in
    :func:`incremental_embedding_matches` unrolls to plain string
    equality in whole-stage codegen.

    Persist this (parquet, partitioned or bucketed by ``key``) as the
    corpus's embedding near-dup index: at 100 TB the index rows are
    (id + L short bit-strings), a tiny fraction of the vectors, and the
    ingest check joins THIS table — never the raw embedding column.
    ``num_planes``/``num_tables`` MUST match between the index build and
    every later probe (keys are sign patterns over md5-derived
    hyperplanes; a mismatch silently generates zero candidates).

    Schema: ``(id, t0..t{L-1}, tbl, key)``.
    """
    all_planes = hyperplanes(num_planes * num_tables, dim)
    keys = F.array(
        *[
            _bucket_expr(
                vec_col,
                all_planes[t * num_planes:(t + 1) * num_planes],
            )
            for t in range(num_tables)
        ]
    )
    keyed = corpus.select(F.col(id_col).alias("id"), keys.alias("keys"))
    if not corpus.isStreaming:
        keyed = keyed.localCheckpoint(eager=False)
    return keyed.select(
        "id",
        *[F.element_at("keys", t + 1).alias(f"t{t}") for t in range(num_tables)],
        F.posexplode("keys").alias("tbl", "key"),
    )


def incremental_embedding_matches(
    arriving: DataFrame,
    index: DataFrame,
    corpus_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    num_planes: int = 4,
    num_tables: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Verified cosine near-duplicates of arriving vectors against an
    accepted corpus: ``(vec_id, accepted_id, cos_sim)``, exactly one row
    per matching (arriving, accepted) pair — the embedding twin of
    :func:`~.dedup.incremental_minhash_matches`.

    Arriving vectors hash into the SAME table keys the index was built
    with and equi-join it on ``(tbl, key)``; collisions verify by exact
    cosine against ``corpus_vectors`` (the accepted ``(id, vector)``
    table — at scale, columnar-pruned to just those two columns).
    Exactly-once admission at the first colliding table (scalar
    comparisons on both sides' flattened keys), so the inflated
    candidate stream never needs a dedup shuffle.

    Streaming-clean: with ``arriving`` from ``readStream`` both joins
    are stream-static append-mode, no keyed state — the arriving vector
    rides THROUGH the key explode (bounded by micro-batch size; L rows
    per vector). On the BATCH path the exploded rows carry only the id
    and key scalars, and the vectors join onto admitted candidates
    afterwards — never duplicated L-x through the exploded join.
    """
    all_planes = hyperplanes(num_planes * num_tables, dim)
    keys = F.array(
        *[
            _bucket_expr(
                vec_col,
                all_planes[t * num_planes:(t + 1) * num_planes],
            )
            for t in range(num_tables)
        ]
    )
    staged = arriving.select(
        F.col(id_col).alias("__arr_id"),
        F.col(vec_col).alias("__arr_vec"),
        l2_norm(vec_col).alias("__arr_nrm"),
        keys.alias("__keys"),
    )
    if arriving.isStreaming:
        arr_carry = ["__arr_id", "__arr_vec", "__arr_nrm"]
    else:
        arr_carry = ["__arr_id"]
        staged = staged.localCheckpoint(eager=False)
    from .dedup import _BAND_SALTS

    arr = staged.select(
        *arr_carry,
        *[F.element_at("__keys", t + 1).alias(f"__arr_t{t}") for t in range(num_tables)],
        F.posexplode("__keys").alias("tbl", "key"),
        F.explode(F.array(*[F.lit(s) for s in range(_BAND_SALTS)])).alias(
            "__salt"
        ),
    )
    acc = index.select(
        F.col("id").alias("__acc_id"),
        *[F.col(f"t{t}").alias(f"__acc_t{t}") for t in range(num_tables)],
        "tbl", "key",
        F.pmod(F.xxhash64(F.col("id")), F.lit(_BAND_SALTS)).alias("__salt"),
    )
    earlier_table_collides = F.lit(False)
    for t in range(num_tables - 1):
        earlier_table_collides = earlier_table_collides | (
            (F.col("tbl") > F.lit(t))
            & (F.col(f"__arr_t{t}") == F.col(f"__acc_t{t}"))
        )
    # pin the parallelism of the row-amplifying table-key join — same
    # rationale, salting scheme (arriving rows replicated across all
    # sub-buckets, each index row in exactly one, pairs still meet
    # exactly once) and measurement as incremental_minhash_matches
    # (dedup.py): a broadcast index plus AQE byte-coalescing of the
    # slim arriving exchange pins the fan-out onto ~1 partition, and a
    # mega-bucket's fan-out onto one task; the explicit fixed-width
    # repartition is exempt from AQE coalescing
    width = arr.sparkSession.conf.get("spark.sql.shuffle.partitions")
    if str(width).isdigit():
        arr = arr.repartition(int(width), "tbl", "key", "__salt")
    cands = (
        arr.join(acc, on=["tbl", "key", "__salt"])
        .filter(~earlier_table_collides)
        .drop("__salt")
    )
    if not arriving.isStreaming:
        cands = cands.join(
            staged.select("__arr_id", "__arr_vec", "__arr_nrm"), on="__arr_id"
        )
    acc_vecs = corpus_vectors.select(
        F.col(id_col).alias("__acc_id"),
        F.col(vec_col).alias("__acc_vec"),
        l2_norm(vec_col).alias("__acc_nrm"),
    )
    return (
        cands.join(acc_vecs, on="__acc_id")
        .withColumn(
            "cos_sim",
            paired_cosine("__arr_vec", "__acc_vec", "__arr_nrm", "__acc_nrm"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select(
            F.col("__arr_id").alias(id_col),
            F.col("__acc_id").alias("accepted_id"),
            F.round("cos_sim", 4).alias("cos_sim"),
        )
    )


def incremental_embedding_dedup(
    arriving: DataFrame,
    index: DataFrame,
    corpus_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    num_planes: int = 4,
    num_tables: int = 4,
    dim: int = 64,
    within_batch: bool = True,
) -> DataFrame:
    """Ingest-time embedding dedup: keep arriving vectors with no
    verified near-duplicate in the accepted corpus and (by default) drop
    the larger-id side of verified near-dup pairs WITHIN the batch —
    the embedding twin of :func:`~.dedup.incremental_minhash_dedup`.
    Batch-only for the same reason (the anti-joins derive from
    ``arriving`` itself; over a stream run the matches inside
    ``foreachBatch``)."""
    if arriving.isStreaming:
        raise ValueError(
            "incremental_embedding_dedup is batch-only; over a stream use "
            "incremental_embedding_matches inside foreachBatch"
        )
    matched = incremental_embedding_matches(
        arriving, index, corpus_vectors, id_col, vec_col, threshold,
        num_planes, num_tables, dim,
    ).select(id_col).distinct()
    fresh = arriving.join(matched, on=id_col, how="left_anti")
    if not within_batch:
        return fresh
    pairs = embedding_near_duplicates_lsh(
        fresh, id_col, vec_col, threshold=threshold,
        num_planes=num_planes, num_tables=num_tables, dim=dim,
    )
    losers = pairs.select(
        F.greatest(F.col("a_id"), F.col("b_id")).alias(id_col)
    ).distinct()
    return fresh.join(losers, on=id_col, how="left_anti")
