"""Product quantization for ANN search (Jégou, Douze, Schmid, "Product
Quantization for Nearest Neighbor Search", TPAMI 2011).

The memory-compression arm of the ANN family: split each d-dim vector
into ``m`` contiguous sub-vectors, learn a tiny k-means codebook per
sub-space, and store each corpus vector as ``m`` small integer codes —
at m=4, k=8 that is 4 codes (3 bits each) instead of 64 floats, a
~64x shrink of the scanned table. Search runs in the COMPRESSED
domain via Asymmetric Distance Computation (ADC): per query, build an
m x k lookup table of exact sub-distances to every codebook centroid
(one array expression, no data scan), then score each corpus row as
the sum of ``m`` table lookups — pure whole-stage-codegen arithmetic
over a table a fraction of the raw corpus's size. At 100 TB this is
the standard IVF-PQ recipe's second half: the coarse IVF (already in
``operators/ann.py``) prunes WHICH rows to score, PQ shrinks WHAT is
read and computed per row; :func:`ivf_pq_topk` composes the two.

Spark-first shape, mirroring ``operators/kmeans.py`` (whose
determinism contract this reuses verbatim):

- training collects only k x (d/m) floats per block per iteration
  (driver-size constant; at real scale you train on a sample anyway —
  pass a sampled DataFrame),
- codebooks ride in the ADC expressions as LITERALS (broadcast in
  spirit — no join, no shuffle, for the same reason kmeans embeds its
  centroids),
- the compressed scan is ONE broadcast of the (small) query side
  against the codes table + a top-k rank window — the exact plan
  shape of the pack's brute-force baseline, on a 64x smaller table.

Oracle-grade determinism: with ``quantize=d`` every vector component
is ``floor(x * 10^d + 0.5)`` first; sub-distance folds run in element
order, ADC adds block LUT entries in block order, and ties rank
toward the lower centroid/neighbor id — so a fixed-iteration run is
bit-reproducible in ANSI SQL (see plans/queries_vector.ann_pq_adc_topk,
the same unrolled-Lloyd's oracle family as kmeans_assignments).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import as_double


@dataclass(frozen=True)
class PQCodebooks:
    """Codebooks tagged with the vector domain they were trained in.

    ADC distances are only meaningful when query LUTs and corpus codes
    use codebooks from the SAME domain: ``"raw"`` (absolute vectors —
    :func:`pq_train`, plain :func:`pq_topk`) or ``"residual"``
    (displacement from the vector's own IVF-list centroid —
    :func:`ivf_pq_train` with ``residual=True``, consumed by
    :func:`ivf_pq_topk(residual=True)``). A raw-trained book fed to the
    residual path computes distances in the wrong domain and silently
    degrades recall with no error — so the tagged form is validated at
    every consumer, while plain ``list`` codebooks remain accepted for
    backward compatibility (caller-trusted, per each docstring)."""

    books: list[list[list[float]]]
    encoding: str  # "raw" | "residual"


def _unwrap_books(codebooks, expected: str, caller: str):
    """Accept tagged or plain codebooks; validate the tag when present."""
    if isinstance(codebooks, PQCodebooks):
        if codebooks.encoding != expected:
            raise ValueError(
                f"{caller} needs {expected!r}-encoded codebooks, got "
                f"{codebooks.encoding!r} — train with "
                + ("ivf_pq_train(..., residual=True)"
                   if expected == "residual" else
                   "pq_train / ivf_pq_train(..., residual=False)")
            )
        return codebooks.books
    return codebooks


def _sq_dist(vec_sql: str, centroid: list[float]) -> Column:
    """Ordered-fold squared distance to a literal centroid (the kmeans
    expression, reused for the sub-space folds). Built as ONE ``F.expr``
    call — the composed ``F.lit(centroid)`` form cost sub_dim lit()
    round-trips + two lambda handshakes per centroid, and PQ builds
    m x k of these per plan (see functions/vectors.py r11 note); the
    parsed SQL is the identical expression tree."""
    arr = "array(" + ", ".join(f"{v!r}D" for v in centroid) + ")"
    return F.expr(
        f"aggregate(zip_with({vec_sql}, {arr}, (x, c) -> (x - c) * (x - c)), "
        f"0.0D, (acc, x) -> acc + x)"
    )


def _quantized(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    quantize: int | None,
    extra_cols: tuple = (),
):
    return df.select(
        id_col, _quantize_expr(vec_col, quantize).alias("__v"), *extra_cols
    )


def _quantize_expr(vec: "Column | str", quantize: int | None) -> Column:
    if quantize is None:
        return as_double(vec)
    scale = float(10**quantize)
    return F.transform(
        as_double(vec),
        lambda x: F.floor(x * scale + F.lit(0.5)).cast("double"),
    )


def _lloyd_codebook(
    work: DataFrame, k: int, max_iterations: int, id_col: str
) -> list[list[float]]:
    """Centroids after fixed Lloyd iterations on ``(id, __v)`` rows —
    the ``operators/kmeans.kmeans`` loop returning the CODEBOOK instead
    of assignments (same init: k smallest ids; same tie-break: lower
    centroid id; same exact-integer mean update; same converged-early
    break, which is oracle-safe because a fixed point reproduces itself
    under further unrolled iterations).

    This per-block form is the REFERENCE implementation: ``pq_train``
    runs the mathematically identical joint formulation (one job for
    all blocks per iteration instead of one per block);
    ``test_pq.py::test_joint_train_equals_per_block`` pins the
    equality."""
    init = work.orderBy(id_col).limit(k).select("__v").collect()
    centroids: list[list[float]] = [[float(x) for x in row["__v"]] for row in init]
    for it in range(max_iterations):
        if it == max_iterations - 1:
            break  # the last pass would only re-assign; codes do that
        dists = F.array(*[_sq_dist("`__v`", c) for c in centroids])
        assigned = work.select(
            F.col("__v"),
            F.array_position(dists, F.array_min(dists)).cast("bigint").alias("cluster"),
        )
        means = (
            assigned.select("cluster", F.posexplode("__v").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg((F.sum("val") / F.count(F.lit(1))).alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dims"))
            .select("cluster", F.transform("dims", lambda s: s["m"]).alias("centroid"))
            .orderBy("cluster")
            .collect()
        )
        new_centroids = list(centroids)
        for row in means:
            new_centroids[row["cluster"] - 1] = [float(x) for x in row["centroid"]]
        if new_centroids == centroids:
            break
        centroids = new_centroids
    return centroids


def _block_bounds(dim: int, m: int) -> list[tuple[int, int]]:
    """1-based (start, length) of each contiguous sub-vector block."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    return [(b * sub + 1, sub) for b in range(m)]


def pq_train(
    df: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iterations: int = 2,
    quantize: int | None = 6,
) -> list[list[list[float]]]:
    """Train the ``m`` sub-space codebooks: ``codebooks[b][c]`` is the
    (d/m)-dim centroid of code ``c+1`` in block ``b``. All blocks train
    JOINTLY — one init collect plus ONE assignment+means job per
    iteration covers every block (the per-block loop form ran m x iters
    tiny jobs whose fixed task-launch latency dominated the measured
    cost: 5.3 s -> see the per-iteration shape below). With
    ``quantize`` set (components floored to integers first, the
    oracle-parity mode every registered query uses) the result is
    bit-identical to running :func:`_lloyd_codebook` per block: same
    k-smallest-id init, same assignment expressions, and the joint
    means aggregate sums exactly the per-block groups (a converged
    block keeps reproducing its fixpoint while others iterate) —
    integer-exact sums make the joint aggregate's different summation
    order irrelevant. With ``quantize=None`` the mean of each group is
    a float sum in a different (and run-nondeterministic) order than
    the per-block form, so means can diverge in the last bits. The
    returned structure is driver-sized (m x k x d/m floats) and rides
    downstream expressions as literals."""
    bounds = _block_bounds(dim, m)
    work = _quantized(df, id_col, vec_col, quantize)
    # ONE init job: the k smallest-id FULL vectors, sliced driver-side
    init = work.orderBy(id_col).limit(k).select("__v").collect()
    if not init:
        # empty codebooks would surface much later as an opaque
        # array_position-on-empty-array AnalysisException in pq_assign
        raise ValueError("pq_train: cannot train codebooks on an empty corpus")
    sub = dim // m
    books: list[list[list[float]]] = [
        [[float(x) for x in row["__v"][start - 1 : start - 1 + sub]] for row in init]
        for (start, _) in bounds
    ]
    for it in range(max_iterations):
        if it == max_iterations - 1:
            break  # the last pass would only re-assign; pq_assign does that
        cluster_cols = []
        for b, (start, s) in enumerate(bounds):
            sl = f"slice(`__v`, {start}, {s})"
            dists = F.array(*[_sq_dist(sl, c) for c in books[b]])
            cluster_cols.append(
                F.array_position(dists, F.array_min(dists))
                .cast("int")
                .alias(f"__c{b}")
            )
        assigned = work.select(*cluster_cols, "__v")
        # one exploded aggregate covers every block: dim//sub names the
        # block, the block's own cluster column is picked by index
        exploded = assigned.select(
            *[f"__c{b}" for b in range(m)],
            F.posexplode("__v").alias("d0", "val"),
        ).select(
            (F.col("d0") / sub).cast("int").alias("blk"),
            F.get(
                F.array(*[F.col(f"__c{b}") for b in range(m)]),
                (F.col("d0") / sub).cast("int"),
            ).alias("cl"),
            (F.col("d0") % sub).alias("sdim"),
            "val",
        )
        means = (
            exploded.groupBy("blk", "cl", "sdim")
            .agg((F.sum("val") / F.count(F.lit(1))).alias("mu"))
            .collect()
        )
        new_books = [list(bb) for bb in books]
        upd: dict[tuple, list] = {}
        for r in means:
            upd.setdefault((r["blk"], r["cl"]), [None] * sub)[r["sdim"]] = float(
                r["mu"]
            )
        for (blk, cl), vec in upd.items():
            new_books[blk][cl - 1] = vec
        if new_books == books:
            break
        books = new_books
    return books


def pq_assign(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int | None = 6,
    extra_cols: tuple = (),
) -> DataFrame:
    """Compress each vector to its per-block codes: ``(id, code_1 ..
    code_m [, extra_cols])``, code ``b`` = argmin centroid of block
    ``b`` (ties to the lower code). One narrow projection over the
    corpus — this is the table a PQ deployment PERSISTS; everything
    downstream scans codes, never raw vectors. ``extra_cols`` pass
    through untouched (e.g. the IVF list id). ``codebooks`` may be a
    tagged :class:`PQCodebooks`; the tag is not validated here because
    the required domain is whatever ``df``'s vectors are already in —
    the search entry points validate at their boundary."""
    if isinstance(codebooks, PQCodebooks):
        codebooks = codebooks.books
    m = len(codebooks)
    if m == 0 or any(not book for book in codebooks):
        raise ValueError(
            "pq_assign: empty codebook(s) — pass the output of pq_train "
            "on a non-empty corpus"
        )
    work = _quantized(df, id_col, vec_col, quantize, extra_cols=extra_cols)
    cols = [F.col(id_col)] + [F.col(c) for c in extra_cols]
    for b, (start, sub) in enumerate(_block_bounds(dim, m)):
        sl = f"slice(`__v`, {start}, {sub})"
        dists = F.array(*[_sq_dist(sl, c) for c in codebooks[b]])
        cols.append(
            F.array_position(dists, F.array_min(dists))
            .cast("bigint")
            .alias(f"code_{b + 1}")
        )
    return work.select(*cols)


def pq_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    topk: int = 10,
    quantize: int | None = 6,
) -> DataFrame:
    """ADC top-k: ``(query_id, neighbor_id, rank, adc_dist)``.

    Per query row, an m x k LUT of exact sub-distances to every
    codebook centroid is ONE array-literal expression (k folds per
    block — no scan); the compressed scan broadcasts the slim query
    side against the codes table and scores each row as m array
    lookups added in block order. Ranking ties break toward the lower
    neighbor id. ``adc_dist`` is emitted unrounded: with ``quantize``
    every term is a deterministic ordered fold, bit-equal across
    engines (the kmeans precedent).

    ``codebooks`` must be RAW-encoded (trained on absolute vectors,
    the :func:`pq_train` output; a residual-trained book scores in the
    wrong domain) — a tagged :class:`PQCodebooks` is validated, a
    plain list is trusted."""
    codebooks = _unwrap_books(codebooks, "raw", "pq_topk")
    return _adc_rank_topk(
        codes.crossJoin(
            F.broadcast(_query_luts(queries, codebooks, dim, id_col, vec_col, quantize))
        ),
        codebooks,
        id_col,
        topk,
    )


def _lut_cols(codebooks: list[list[list[float]]], dim: int) -> list[Column]:
    """The ``__lut_1 .. __lut_m`` array expressions over a quantized
    ``__v`` column — the single source for ADC LUT construction (fold
    order, naming) used by every caller, plain or residual."""
    return [
        F.array(
            *[_sq_dist(f"slice(`__v`, {start}, {sub})", c) for c in codebooks[b]]
        ).alias(f"__lut_{b + 1}")
        for b, (start, sub) in enumerate(_block_bounds(dim, len(codebooks)))
    ]


def _query_luts(
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    dim: int,
    id_col: str,
    vec_col: str,
    quantize: int | None,
) -> DataFrame:
    """Per-query ADC lookup tables: ``(query_id, __lut_1 .. __lut_m)``,
    block b's array holding the exact sub-distance to each of its k
    centroids — one array-literal expression per block, no data scan.
    Shared by :func:`pq_topk` and :func:`ivf_pq_topk` so the LUT
    construction, fold order, and naming can never drift apart."""
    return _quantized(queries, id_col, vec_col, quantize).select(
        F.col(id_col).alias("query_id"),
        *_lut_cols(codebooks, dim),
    )


def _adc_rank_topk(
    joined: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str,
    topk: int,
) -> DataFrame:
    """Score + rank a (codes x query-LUT) join: ADC = the m block
    lookups added IN BLOCK ORDER (the oracle mirrors this exact
    addition order), self-matches excluded (family convention:
    ivf_topk, lsh_topk), ties toward the lower neighbor id. Shared by
    both ADC callers for the same no-drift reason as
    :func:`_query_luts`."""
    from pyspark.sql.window import Window

    adc = None
    for b in range(len(codebooks)):
        term = F.get(F.col(f"__lut_{b + 1}"), F.col(f"code_{b + 1}").cast("int") - 1)
        adc = term if adc is None else adc + term
    scored = joined.filter(F.col("query_id") != F.col(id_col)).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        adc.alias("adc_dist"),
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= topk)
        .select("query_id", "neighbor_id", "rank", "adc_dist")
    )


def _centroid_vec_table(centroids: DataFrame) -> DataFrame:
    """Broadcast-ready ``(ivf_bucket, __cvec)`` view of the IVF
    centroid table (``operators/ann.py`` contract: ``centroid_id`` +
    ``centroid_vec``)."""
    return F.broadcast(
        centroids.select(
            F.col("centroid_id").alias("ivf_bucket"),
            F.col("centroid_vec").alias("__cvec"),
        )
    )


def _to_residuals(lists: DataFrame, cvt: DataFrame, vec_col: str) -> DataFrame:
    """Replace each listed vector with its displacement from its own
    list's coarse centroid — the domain the residual codebooks model."""
    res = F.zip_with(as_double(vec_col), as_double("__cvec"), lambda x, c: x - c)
    return lists.join(cvt, "ivf_bucket").withColumn(vec_col, res).drop("__cvec")


def ivf_pq_train(
    corpus: DataFrame,
    centroids: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iterations: int = 2,
    quantize: int | None = 6,
    residual: bool = False,
) -> PQCodebooks:
    """Train IVF-PQ codebooks externally (e.g. on a sample) and get
    them back TAGGED with their encoding, so a later
    ``ivf_pq_topk(codebooks=...)`` call can validate the domain instead
    of silently scoring in the wrong one. ``residual=True`` trains on
    each vector's displacement from its own coarse-list centroid (the
    paper's higher-recall encoding); ``residual=False`` is equivalent
    to :func:`pq_train` on the raw corpus, tagged ``"raw"``."""
    from .ann import ivf_assign

    lists = ivf_assign(corpus, centroids, id_col, vec_col)
    if residual:
        lists = _to_residuals(lists, _centroid_vec_table(centroids), vec_col)
    books = pq_train(
        lists, dim=dim, m=m, k=k, id_col=id_col, vec_col=vec_col,
        max_iterations=max_iterations, quantize=quantize,
    )
    return PQCodebooks(books, "residual" if residual else "raw")


def ivf_pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    topk: int = 10,
    quantize: int | None = 6,
    codebooks: list[list[list[float]]] | None = None,
    residual: bool = False,
) -> DataFrame:
    """IVF-PQ composition — the 100 TB serving recipe: coarse-quantize
    the corpus into inverted lists (``operators/ann.py`` IVF machinery
    and its ``centroids`` table contract: ``centroid_id`` +
    ``centroid_vec``), PQ-compress each row, and have queries score
    ONLY their ``nprobe`` nearest lists' codes via ADC. The scan cost
    per query drops from |corpus| rows of d floats to |corpus| *
    nprobe / n_lists rows of m codes. Returns the :func:`pq_topk`
    schema (ranks within the probed lists).

    ``residual=True`` selects the paper's higher-recall encoding: each
    vector is PQ-coded as its RESIDUAL from the coarse centroid of its
    list (codebooks then model the within-list displacement, which has
    much lower variance than raw positions), and each query builds a
    SEPARATE LUT per probed list from its residual against THAT list's
    centroid. Costs: the per-query LUT work multiplies by nprobe (still
    expression-only, computed on the nq x nprobe probe rows before the
    codes join), and the codebooks are list-relative so they cannot be
    reused by plain :func:`pq_topk`.

    Other composition notes: the corpus side keeps ONE list per vector
    (``ivf_assign`` nprobe=1) so a (query, neighbor) pair meets through
    at most one probe and needs no dedup; pass ``codebooks`` to reuse a
    trained set (e.g. from a sample) instead of training on the full
    corpus here. Supplied codebooks must match the encoding this call
    scores in — residual-trained for ``residual=True``
    (:func:`ivf_pq_train` with the same ``centroids``), raw-trained
    otherwise; a tagged :class:`PQCodebooks` is validated, a plain
    list is trusted."""
    from .ann import ivf_assign

    expected = "residual" if residual else "raw"
    lists = ivf_assign(corpus, centroids, id_col, vec_col)
    if residual:
        cvt = _centroid_vec_table(centroids)
        lists = _to_residuals(lists, cvt, vec_col)
    books = (
        _unwrap_books(codebooks, expected, "ivf_pq_topk")
        if codebooks is not None
        else pq_train(
            lists, dim=dim, m=m, k=k, id_col=id_col, vec_col=vec_col,
            quantize=quantize,
        )
    )
    codes = pq_assign(
        lists,
        books,
        dim=dim,
        id_col=id_col,
        vec_col=vec_col,
        quantize=quantize,
        extra_cols=("ivf_bucket",),
    )
    qprobe = ivf_assign(queries, centroids, id_col, vec_col, nprobe=nprobe)
    if residual:
        # per-(query, probed-list) LUTs from the query's residual
        # against that list's centroid — nq x nprobe rows of m x k
        # fold expressions, no broadcasted literal query table
        qres = _quantize_expr(
            F.zip_with(as_double(vec_col), as_double("__cvec"), lambda x, c: x - c),
            quantize,
        )
        qwork = (
            qprobe.join(cvt, "ivf_bucket")
            .withColumn("__v", qres)
            .select(
                F.col(id_col).alias("query_id"),
                "ivf_bucket",
                *_lut_cols(books, dim),
            )
        )
        probed = qwork.join(codes, "ivf_bucket")
        return _adc_rank_topk(probed, books, id_col, topk)
    qprobe = qprobe.select(F.col(id_col).alias("query_id"), "ivf_bucket")
    qwork = _query_luts(queries, books, dim, id_col, vec_col, quantize)
    probed = qprobe.join(F.broadcast(qwork), "query_id").join(codes, "ivf_bucket")
    return _adc_rank_topk(probed, books, id_col, topk)
