"""Embedding / similarity-search queries with DuckDB oracles.

Dot products fold left in element order on both engines (Spark
``aggregate`` with 0.0 init == DuckDB ``list_reduce``), so scores are
bit-deterministic; outputs are additionally rounded to 4 digits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import l2_norm, vector_dim
from ..operators import ann as A
from .common import QuerySpec, load, spread

QUERIES: dict[str, QuerySpec] = {}


def q(name: str, sql: str | None, doc: str = ""):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn=fn, sql=sql, doc=doc)
        return fn

    return deco


_DOT = (
    "list_reduce(list_transform(range(1, 65), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE),"
    " (x, y) -> x + y)"
)
_NORM = (
    "sqrt(list_reduce(list_transform({v}, x -> x::DOUBLE * x::DOUBLE),"
    " (a, b) -> a + b))"
)
_COS = (
    _DOT.format(a="{a}", b="{b}")
    + " / (" + _NORM.format(v="{a}") + " * " + _NORM.format(v="{b}") + ")"
)


@q(
    "embedding_norms",
    f"""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           round({_NORM.format(v='embedding')}, 4) AS l2_norm
    FROM embeddings
    """,
    "per-vector L2 norms via ordered fold (zip_with/aggregate — no UDF)",
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        vector_dim("embedding").alias("dim"),
        F.round(l2_norm("embedding"), 4).alias("l2_norm"),
    )


@q(
    "ann_bruteforce_topk",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
    scored AS (
      SELECT q.query_id, c.neighbor_id,
             {_COS.format(a='q.qv', b='c.cv')} AS cos_full
      FROM q CROSS JOIN c WHERE q.query_id <> c.neighbor_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos_full,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_full DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
           round(cos_full, 4) AS cos_sim
    FROM ranked WHERE rank <= 5
    """,
    "exact cosine top-k baseline: broadcast queries x partitioned corpus, "
    "rank window per query",
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return A.brute_force_topk(e.filter(F.col("vec_id") < 10), spread(spark, e), k=5)


def _planes_sql(num_planes: int = 4, dim: int = 64) -> list[str]:
    return [
        "[" + ", ".join(repr(x) for x in plane) + "]::DOUBLE[]"
        for plane in A.hyperplanes(num_planes, dim)
    ]


_BUCKET_SQL = " || ".join(
    f"(CASE WHEN list_reduce(list_transform(range(1, 65),"
    f" i -> embedding[i]::DOUBLE * ({p})[i]), (x, y) -> x + y) >= 0"
    f" THEN '1' ELSE '0' END)"
    for p in _planes_sql()
)


@q(
    "ann_lsh_bucketed",
    f"""
    WITH b AS (
      SELECT vec_id, embedding, {_BUCKET_SQL} AS bucket FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM b WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv, bucket FROM b),
    scored AS (
      SELECT q.query_id, c.neighbor_id,
             {_COS.format(a='q.qv', b='c.cv')} AS cos_full
      FROM q JOIN c ON q.bucket = c.bucket AND q.query_id <> c.neighbor_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos_full,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_full DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
           round(cos_full, 4) AS cos_sim
    FROM ranked WHERE rank <= 3
    """,
    "LSH-bucketed ANN (sign-of-projection on md5-derived hyperplanes): "
    "the candidate scan becomes an equi-join on the bucket key",
)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return A.lsh_topk(e.filter(F.col("vec_id") < 10), spread(spark, e), k=3)


@q(
    "embedding_near_dup_blocked",
    f"""
    WITH e AS (SELECT vec_id, embedding, label FROM embeddings)
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           round({_COS.format(a='a.embedding', b='b.embedding')}, 4) AS cos_sim
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_COS.format(a='a.embedding', b='b.embedding')} >= 0.25
    """,
    "embedding-cosine near-duplicate pairs within label blocks "
    "(embedding-space dedup)",
)
def embedding_near_dup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return A.embedding_near_duplicates(spread(spark, e), threshold=0.25)


_IVF_CENT = "vec_id % 50 = 0 AND vec_id < 500"  # 10 fixed coarse centroids


@q(
    "ann_ivf_topk",
    f"""
    WITH cent AS (
      SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings
      WHERE {_IVF_CENT}
    ),
    assigned AS (
      SELECT e.vec_id, e.embedding, c.centroid_id,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_COS.format(a='e.embedding', b='c.cv')} DESC,
                        c.centroid_id) AS rk
      FROM embeddings e CROSS JOIN cent c
    ),
    b AS (
      SELECT vec_id, embedding, centroid_id AS ivf_bucket
      FROM assigned WHERE rk = 1
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qv, ivf_bucket FROM b WHERE vec_id < 10),
    c2 AS (SELECT vec_id AS neighbor_id, embedding AS nv, ivf_bucket FROM b),
    scored AS (
      SELECT q.query_id, c2.neighbor_id,
             {_COS.format(a='q.qv', b='c2.nv')} AS cos_full
      FROM q JOIN c2 ON q.ivf_bucket = c2.ivf_bucket
       AND q.query_id <> c2.neighbor_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos_full,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_full DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
           round(cos_full, 4) AS cos_sim
    FROM ranked WHERE rank <= 3
    """,
    "IVF-flat ANN: coarse-quantize to 10 fixed centroids (broadcast), "
    "probe only the query's inverted list — an equi-join on ivf_bucket",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    centroids = e.filter(
        (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 500)
    ).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    return A.ivf_topk(
        e.filter(F.col("vec_id") < 10), spread(spark, e), centroids, k=3
    )


def _flip_sql(i: int, n: int = 4) -> str:
    return (
        f"substr(bucket, 1, {i}) || "
        f"(CASE WHEN substr(bucket, {i + 1}, 1) = '1' THEN '0' ELSE '1' END)"
        f" || substr(bucket, {i + 2}, {n - i - 1})"
    )


_PROBES_SQL = "[bucket, " + ", ".join(_flip_sql(i) for i in range(4)) + "]"


@q(
    "ann_lsh_multiprobe",
    f"""
    WITH b AS (
      SELECT vec_id, embedding, {_BUCKET_SQL} AS bucket FROM embeddings
    ),
    q AS (
      SELECT vec_id AS query_id, embedding AS qv,
             unnest({_PROBES_SQL}) AS bucket
      FROM b WHERE vec_id < 10
    ),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv, bucket FROM b),
    scored AS (
      SELECT q.query_id, c.neighbor_id,
             {_COS.format(a='q.qv', b='c.cv')} AS cos_full
      FROM q JOIN c ON q.bucket = c.bucket AND q.query_id <> c.neighbor_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos_full,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_full DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
           round(cos_full, 4) AS cos_sim
    FROM ranked WHERE rank <= 3
    """,
    "multi-probe LSH ANN: queries probe their bucket + all Hamming-1 "
    "buckets — near-brute-force recall, still an equi-join",
)
def ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return A.multiprobe_lsh_topk(e.filter(F.col("vec_id") < 10), spread(spark, e), k=3)


@q(
    "kmeans_assignments",
    None,  # iterative float-state algorithm: genuinely non-SQL-expressible
           # (driver-coordinated Lloyd fixpoint) -> rows-only check
    "distributed k-means over embeddings: deterministic init (k smallest "
    "ids), literal-broadcast assignment pass + one groupBy per iteration",
)
def kmeans_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.kmeans import kmeans

    e = load(spark, sf_dir, "embeddings")
    return kmeans(spread(spark, e), k=8, max_iterations=3)
