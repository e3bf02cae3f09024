"""Embedding / similarity-search queries with DuckDB oracles.

Dot products fold left in element order on both engines (Spark
``aggregate`` with 0.0 init == DuckDB ``list_reduce``), so scores are
bit-deterministic; outputs are additionally rounded to 4 digits.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import l2_norm, vector_dim
from ..operators import ann as A
from .common import QuerySpec, load, spread, table_bytes

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
    "embedding_vector_pack",
    f"""
    SELECT 'norm' AS section,
           vec_id AS a_id,
           CAST(NULL AS BIGINT) AS b_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           round({_NORM.format(v='embedding')}, 4) AS l2_norm,
           CAST(NULL AS DOUBLE) AS cos_sim
    FROM embeddings
    UNION ALL
    SELECT 'near_dup', a.vec_id, b.vec_id,
           CAST(NULL AS BIGINT),
           CAST(NULL AS DOUBLE),
           round({_COS.format(a='a.embedding', b='b.embedding')}, 4)
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_COS.format(a='a.embedding', b='b.embedding')} >= 0.25
    """,
    "vector-math pack, tagged by section: per-vector L2 norms via ordered "
    "fold (zip_with/aggregate — no UDF), and embedding-cosine "
    "near-duplicate pairs within label blocks (embedding-space dedup; the "
    "unblocked scale path is the LSH variant, pytest recall-tested)",
)
def embedding_vector_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    norms = e.select(
        F.lit("norm").alias("section"),
        F.col("vec_id").alias("a_id"),
        F.lit(None).cast("bigint").alias("b_id"),
        vector_dim("embedding").alias("dim"),
        F.round(l2_norm("embedding"), 4).alias("l2_norm"),
        F.lit(None).cast("double").alias("cos_sim"),
    )
    pairs = A.embedding_near_duplicates(spread(spark, e, input_bytes=table_bytes(sf_dir, "embeddings")), threshold=0.25).select(
        F.lit("near_dup").alias("section"),
        "a_id",
        "b_id",
        F.lit(None).cast("bigint").alias("dim"),
        F.lit(None).cast("double").alias("l2_norm"),
        "cos_sim",
    )
    return norms.unionByName(pairs)


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


def _flip_sql(i: int, n: int = 4) -> str:
    return (
        f"substr(bucket, 1, {i}) || "
        f"(CASE WHEN substr(bucket, {i + 1}, 1) = '1' THEN '0' ELSE '1' END)"
        f" || substr(bucket, {i + 2}, {n - i - 1})"
    )


_PROBES_SQL = "[bucket, " + ", ".join(_flip_sql(i) for i in range(4)) + "]"

_IVF_CENT = "vec_id % 50 = 0 AND vec_id < 500"  # 10 fixed coarse centroids


_ANN_METHODS_BASE_SQL = f"""
    WITH b AS (
      SELECT vec_id, embedding, {_BUCKET_SQL} AS bucket FROM embeddings
    ),
    lsh_q AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM b WHERE vec_id < 10),
    lsh_c AS (SELECT vec_id AS neighbor_id, embedding AS cv, bucket FROM b),
    lsh_scored AS (
      SELECT q.query_id, c.neighbor_id,
             {_COS.format(a='q.qv', b='c.cv')} AS cos_full
      FROM lsh_q q JOIN lsh_c c
        ON q.bucket = c.bucket AND q.query_id <> c.neighbor_id
    ),
    lsh_ranked AS (
      SELECT query_id, neighbor_id, cos_full,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_full DESC, neighbor_id) AS rank
      FROM lsh_scored
    ),
    mp_q AS (
      SELECT vec_id AS query_id, embedding AS qv,
             unnest({_PROBES_SQL}) AS bucket
      FROM b WHERE vec_id < 10
    ),
    mp_scored AS (
      SELECT q.query_id, c.neighbor_id,
             {_COS.format(a='q.qv', b='c.cv')} AS cos_full
      FROM mp_q q JOIN lsh_c c
        ON q.bucket = c.bucket AND q.query_id <> c.neighbor_id
    ),
    mp_ranked AS (
      SELECT query_id, neighbor_id, cos_full,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_full DESC, neighbor_id) AS rank
      FROM mp_scored
    ),
    cent AS (
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
    ivf_b AS (
      SELECT vec_id, embedding, centroid_id AS ivf_bucket
      FROM assigned WHERE rk = 1
    ),
    ivf_q AS (SELECT vec_id AS query_id, embedding AS qv, ivf_bucket
              FROM ivf_b WHERE vec_id < 10),
    ivf_c AS (SELECT vec_id AS neighbor_id, embedding AS nv, ivf_bucket FROM ivf_b),
    ivf_scored AS (
      SELECT q.query_id, c.neighbor_id,
             {_COS.format(a='q.qv', b='c.nv')} AS cos_full
      FROM ivf_q q JOIN ivf_c c
        ON q.ivf_bucket = c.ivf_bucket AND q.query_id <> c.neighbor_id
    ),
    ivf_ranked AS (
      SELECT query_id, neighbor_id, cos_full,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_full DESC, neighbor_id) AS rank
      FROM ivf_scored
    ),
    ivf3_q AS (
      SELECT vec_id AS query_id, embedding AS qv, centroid_id AS ivf_bucket
      FROM assigned WHERE rk <= 3 AND vec_id < 10
    ),
    ivf3_scored AS (
      SELECT q.query_id, c.neighbor_id,
             {_COS.format(a='q.qv', b='c.nv')} AS cos_full
      FROM ivf3_q q JOIN ivf_c c
        ON q.ivf_bucket = c.ivf_bucket AND q.query_id <> c.neighbor_id
    ),
    ivf3_ranked AS (
      SELECT query_id, neighbor_id, cos_full,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_full DESC, neighbor_id) AS rank
      FROM ivf3_scored
    )
    SELECT 'lsh' AS method, query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
           round(cos_full, 4) AS cos_sim
    FROM lsh_ranked WHERE rank <= 3
    UNION ALL
    SELECT 'multiprobe', query_id, neighbor_id, CAST(rank AS BIGINT),
           round(cos_full, 4)
    FROM mp_ranked WHERE rank <= 3
    UNION ALL
    SELECT 'ivf', query_id, neighbor_id, CAST(rank AS BIGINT),
           round(cos_full, 4)
    FROM ivf_ranked WHERE rank <= 3
    UNION ALL
    SELECT 'ivf3', query_id, neighbor_id, CAST(rank AS BIGINT),
           round(cos_full, 4)
    FROM ivf3_ranked WHERE rank <= 3
"""


def ann_methods_arms(spark: SparkSession, sf_dir: str) -> "dict[str, DataFrame]":
    """The pack's constituent plans, individually addressable. The pack
    itself is their union (same row set either way); `bench.py --full`
    also times each arm separately — `ann_methods_topk` has been the
    noisiest gate row (r7: 4.5 s spread on a ~6 s query), and one
    unioned timing can't say WHICH of the six strategies wobbles or
    regresses. The `ivf_both` arm carries both nprobe settings in one
    plan on purpose: the corpus-side coarse quantization (a scan over
    the whole corpus — the dominant IVF cost at scale) runs once and
    is shared by the nprobe=1 and nprobe=3 rows."""
    e = load(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10)
    corpus = spread(spark, e, input_bytes=table_bytes(sf_dir, "embeddings"))
    centroids = e.filter(
        (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 500)
    ).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    exact = A.brute_force_topk(
        queries, corpus, k=5,
        broadcast_queries=True,  # 10 rows; skip the planning probe
    ).select(
        F.lit("exact").alias("method"), "query_id", "neighbor_id", "rank", "cos_sim"
    )
    lsh = A.lsh_topk(queries, corpus, k=3, num_planes=4).select(
        F.lit("lsh").alias("method"), "query_id", "neighbor_id", "rank", "cos_sim"
    )
    mt = A.lsh_topk(queries, corpus, k=3, num_planes=4, num_tables=4).select(
        F.lit("lsh_multi").alias("method"),
        "query_id", "neighbor_id", "rank", "cos_sim",
    )
    mp = A.multiprobe_lsh_topk(queries, corpus, k=3, num_planes=4).select(
        F.lit("multiprobe").alias("method"),
        "query_id", "neighbor_id", "rank", "cos_sim",
    )
    ivf_both = A.ivf_topk_multi(
        queries, corpus, centroids, k=3, nprobes=(1, 3)
    ).select(
        F.when(F.col("nprobe") == 1, "ivf").otherwise("ivf3").alias("method"),
        "query_id", "neighbor_id", "rank", "cos_sim",
    )
    return {
        "exact": exact,
        "lsh": lsh,
        "multiprobe": mp,
        "lsh_multi": mt,
        "ivf_both": ivf_both,
    }


@q(
    "ann_methods_topk",
    None,  # assembled below: base arms + exact + multi-table (needs helpers)
    "six ANN strategies over one corpus, tagged by method: exact "
    "brute-force cosine top-k (the baseline: broadcast queries x "
    "partitioned corpus, rank window), LSH-bucketed (sign-of-projection "
    "on md5-derived hyperplanes — the candidate scan becomes an "
    "equi-join on the bucket key), multi-probe LSH (queries probe their "
    "bucket + all Hamming-1 buckets — near-brute-force recall, still an "
    "equi-join), multi-table LSH (L=4 disjoint plane sets, the standard "
    "recall dial 1-(1-p^b)^L, pair-level dedup), IVF-flat "
    "(coarse-quantize to 10 fixed broadcast centroids, probe only the "
    "query's inverted list), and IVF nprobe=3 (queries probe their 3 "
    "nearest lists; corpus keeps one list per vector so no pair dedup "
    "is needed)",
)
def ann_methods_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    arms = ann_methods_arms(spark, sf_dir)
    # union in the registry's historical order (gate hash is
    # order-insensitive, but keep the plan shape stable anyway)
    out = arms["exact"]
    for name in ("lsh", "multiprobe", "lsh_multi", "ivf_both"):
        out = out.unionByName(arms[name])
    return out


def _table_bucket_sql(table_idx: int, num_planes: int = 4, dim: int = 64,
                      num_tables: int = 4) -> str:
    """Bucket expression for one multi-table LSH table: planes
    [t*b, (t+1)*b) of hyperplanes(b*L, dim) — mirrors lsh_topk's
    num_tables slicing."""
    all_planes = A.hyperplanes(num_planes * num_tables, dim)
    planes = all_planes[table_idx * num_planes:(table_idx + 1) * num_planes]
    plane_sqls = ["[" + ", ".join(repr(x) for x in p) + "]::DOUBLE[]" for p in planes]
    return " || ".join(
        f"(CASE WHEN list_reduce(list_transform(range(1, {dim + 1}),"
        f" i -> embedding[i]::DOUBLE * ({p})[i]), (x, y) -> x + y) >= 0"
        f" THEN '1' ELSE '0' END)"
        for p in plane_sqls
    )


_MT_KEYS_SQL = (
    f"SELECT vec_id, embedding, {_table_bucket_sql(0)} AS k0, "
    f"{_table_bucket_sql(1)} AS k1, {_table_bucket_sql(2)} AS k2, "
    f"{_table_bucket_sql(3)} AS k3 FROM embeddings"
)

# r3 merge: the former `ann_bruteforce_topk` and `ann_multitable_lsh`
# queries became the `exact` / `lsh_multi` arms of ann_methods_topk
# (same output schema, same parameters), freeing registry slots for the
# substring-dedup and LSH-near-dup queries. The appended arms reuse the
# base statement's CTE scope (lsh_q / lsh_c).
QUERIES["ann_methods_topk"].sql = _ANN_METHODS_BASE_SQL + f"""
    UNION ALL
    SELECT 'exact', query_id, neighbor_id, CAST(rank AS BIGINT),
           round(cos_full, 4)
    FROM (
      SELECT query_id, neighbor_id, cos_full,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_full DESC, neighbor_id) AS rank
      FROM (
        SELECT q.query_id, c.neighbor_id,
               {_COS.format(a='q.qv', b='c.cv')} AS cos_full
        FROM lsh_q q CROSS JOIN lsh_c c WHERE q.query_id <> c.neighbor_id
      )
    ) WHERE rank <= 5
    UNION ALL
    SELECT 'lsh_multi', query_id, neighbor_id, CAST(rank AS BIGINT),
           round(cos_full, 4)
    FROM (
      SELECT query_id, neighbor_id, cos_full,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_full DESC, neighbor_id) AS rank
      FROM (
        SELECT cand.query_id, cand.neighbor_id,
               {_COS.format(a='eq.embedding', b='ec.embedding')} AS cos_full
        FROM (
          SELECT DISTINCT a.vec_id AS query_id, c.vec_id AS neighbor_id
          FROM ({_MT_KEYS_SQL}) a JOIN ({_MT_KEYS_SQL}) c
            ON (a.k0 = c.k0 OR a.k1 = c.k1 OR a.k2 = c.k2 OR a.k3 = c.k3)
          WHERE a.vec_id < 10 AND a.vec_id <> c.vec_id
        ) cand
        JOIN embeddings eq ON eq.vec_id = cand.query_id
        JOIN embeddings ec ON ec.vec_id = cand.neighbor_id
      )
    ) WHERE rank <= 3
    """


def _mt_keys_sql_n(num_planes: int, num_tables: int = 4) -> str:
    cols = ", ".join(
        f"{_table_bucket_sql(t, num_planes, num_tables=num_tables)} AS k{t}"
        for t in range(num_tables)
    )
    return f"SELECT vec_id, embedding, {cols} FROM embeddings"


def _near_dup_oracle_sql(pairs_planes: int = 4, acc_planes: int = 4) -> str:
    """DuckDB oracle for ``embedding_near_dup_lsh`` at a given plane
    count per section (the engine adapts planes to corpus size via
    choose_num_planes; the sf1 spot-check generates this at the same
    counts the engine will pick — r8 judge task #6, closing the one
    rows-only entry in the sf1 artifact). Candidates are a UNION of
    per-table equi-joins + DISTINCT rather than one OR-join: the same
    pair set (exactly-once admission admits a set, not a multiset), but
    hash-join-plannable at sf1 scale where an OR-join can fall back to
    quadratic blockwise loops."""
    tables = 4
    pair_arms = "\n      UNION ALL\n".join(
        f"      SELECT a.vec_id AS a_id, c.vec_id AS b_id\n"
        f"      FROM keys a JOIN keys c ON a.k{t} = c.k{t}\n"
        f"      WHERE a.vec_id < c.vec_id"
        for t in range(tables)
    )
    ingest_arms = "\n      UNION ALL\n".join(
        f"      SELECT a.vec_id AS a_id, c.vec_id AS b_id\n"
        f"      FROM keys_acc a JOIN keys_acc c ON a.k{t} = c.k{t}\n"
        f"      WHERE a.vec_id % 10 = 1 AND c.vec_id % 10 = 0"
        for t in range(tables)
    )
    keys_acc = ("SELECT * FROM keys" if acc_planes == pairs_planes
                else _mt_keys_sql_n(acc_planes))
    return f"""
    WITH keys AS ({_mt_keys_sql_n(pairs_planes)}),
    keys_acc AS ({keys_acc}),
    cand AS (
      SELECT DISTINCT a_id, b_id FROM (
{pair_arms}
      )
    ),
    ingest_cand AS (
      SELECT DISTINCT a_id, b_id FROM (
{ingest_arms}
      )
    )
    SELECT 'pairs' AS section, cand.a_id, cand.b_id,
           round({_COS.format(a='ea.embedding', b='eb.embedding')}, 4) AS cos_sim
    FROM cand
    JOIN embeddings ea ON ea.vec_id = cand.a_id
    JOIN embeddings eb ON eb.vec_id = cand.b_id
    WHERE {_COS.format(a='ea.embedding', b='eb.embedding')} >= 0.3
    UNION ALL
    SELECT 'ingest_match', i.a_id, i.b_id,
           round({_COS.format(a='ea.embedding', b='eb.embedding')}, 4)
    FROM ingest_cand i
    JOIN embeddings ea ON ea.vec_id = i.a_id
    JOIN embeddings eb ON eb.vec_id = i.b_id
    WHERE {_COS.format(a='ea.embedding', b='eb.embedding')} >= 0.3
    """


def _embeddings_rowcount(sf_dir: str) -> int:
    """Row count from parquet footers (no Spark/DuckDB job) — the same
    n the engine's df.count() sees, for plane-count agreement."""
    from .common import table_rowcount

    return table_rowcount(sf_dir, "embeddings")


def _near_dup_adaptive_sql(sf_dir: str) -> str:
    """Scale-aware oracle: regenerate the SQL at the plane counts
    choose_num_planes will pick for THIS corpus (pairs: full corpus;
    ingest: the accepted tenth) — tools/check_oracle.py prefers this
    over the pinned 4-plane form, so the sf1 spot-check values-matches
    instead of recording oracle-declared-invalid."""
    n = _embeddings_rowcount(sf_dir)
    return _near_dup_oracle_sql(
        A.choose_num_planes(n), A.choose_num_planes(max(1, n // 10))
    )


@q(
    "embedding_near_dup_lsh",
    _near_dup_oracle_sql(4, 4),
    "UNBLOCKED embedding-cosine near-duplicate pairs: multi-table "
    "sign-of-projection LSH self-join (4 tables of md5-derived "
    "hyperplanes, ADAPTIVE plane count via choose_num_planes; the "
    "static oracle SQL is generated at 4 planes — the gate band — and "
    "a build-time guard fails loudly if the gate corpus ever outgrows "
    "it, while adaptive_sql regenerates the oracle at any scale's "
    "plane counts) with exactly-once pair admission at the first "
    "colliding table, then exact-cosine verify >= 0.3 (section "
    "'pairs'). Section 'ingest_match' (r5) drives the INGEST-TIME "
    "variant — lsh_corpus_index of an accepted corpus (vec_id%10=0) "
    "probed by an arriving batch (vec_id%10=1) via "
    "incremental_embedding_matches, the embedding twin of the minhash "
    "ingest path. The oracle's per-table equi-joins (union + distinct) "
    "over the same table keys yield the identical pair sets; the "
    "engine never runs the all-pairs scan",
)
def embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ADAPTIVE plane count (the operator's scale path: bucket space grows
    # with the corpus so per-bucket candidate cost stays flat — a pinned
    # 4-plane run was measured x3.8 slower at x10 data). Oracle parity:
    # the SQL above hard-codes 4-plane keys (k0..k3), valid only while
    # choose_num_planes(n) == 4 — i.e. n <= 16 * TARGET_BUCKET_SIZE.
    # Guard it at query-build time so a larger gate corpus fails with a
    # clear message instead of a mystery hash-mismatch.
    e = load(spark, sf_dir, "embeddings")
    ee = spread(spark, e, input_bytes=table_bytes(sf_dir, "embeddings"))
    # r11: the plane-count input is the table's row count — read it from
    # the parquet footers (the same metadata the oracle's adaptive_sql
    # already uses, exactly equal to ee.count()) instead of running a
    # full scan+repartition Spark job at plan-build time. One less job
    # per invocation; identical n, identical plan downstream.
    n = _embeddings_rowcount(sf_dir)
    planes = A.choose_num_planes(n)
    if n <= 16 * A.TARGET_BUCKET_SIZE and planes != 4:
        # inside the band the oracle depends on, a non-4 answer means
        # choose_num_planes itself drifted — fail loudly, not as a
        # mystery hash-mismatch in the gate
        raise AssertionError(
            f"embedding_near_dup_lsh's DuckDB oracle is pinned at 4-plane "
            f"LSH keys, but choose_num_planes({n}) = {planes} inside the "
            f"4-plane band — choose_num_planes changed; regenerate "
            f"_MT_KEYS_SQL or fix the function"
        )
    if planes != 4:
        # beyond the band (e.g. the sf1 bench corpus) the query stays
        # ADAPTIVE — that is the operator's scale behavior the bench
        # measures — and the STATIC oracle is declared invalid up front
        # so a driver-gate run at this scale is diagnosable, never a
        # silent hash-mismatch. check_oracle.py ignores this declaration
        # because it regenerates the oracle via adaptive_sql (r9).
        print(
            f"[embedding_near_dup_lsh] corpus of {n} vectors uses "
            f"{planes} planes; the static 4-plane DuckDB oracle is NOT "
            f"valid at this scale (adaptive_sql regenerates it)",
            file=sys.stderr,
        )
    pairs = A.embedding_near_duplicates_lsh(
        ee, threshold=0.3, num_planes=planes, num_tables=4, corpus_rows=n
    ).select(
        F.lit("pairs").alias("section"), "a_id", "b_id", "cos_sim"
    )
    # ingest-time section: accepted corpus indexed once, arriving batch
    # probes the index (stream-static-clean plan; here driven in batch).
    # Plane count adapts to the ACCEPTED corpus's own size — identical
    # to the pinned oracle at every gate/bench scale (accepted is 10x
    # smaller than the corpus the guard above already checked).
    accepted = ee.filter(F.col("vec_id") % 10 == 0)
    arriving = ee.filter(F.col("vec_id") % 10 == 1)
    # the %10 split makes the accepted corpus n/10 rows by construction
    # — reuse the count already paid for instead of a second job
    acc_planes = A.choose_num_planes(max(1, n // 10))
    index = A.lsh_corpus_index(accepted, num_planes=acc_planes, num_tables=4)
    ingest = A.incremental_embedding_matches(
        arriving, index, accepted, threshold=0.3,
        num_planes=acc_planes, num_tables=4,
    ).select(
        F.lit("ingest_match").alias("section"),
        F.col("vec_id").alias("a_id"),
        F.col("accepted_id").alias("b_id"),
        "cos_sim",
    )
    return pairs.unionByName(ingest)


# scale-aware oracle hook (see QuerySpec.adaptive_sql)
QUERIES["embedding_near_dup_lsh"].adaptive_sql = _near_dup_adaptive_sql


def _kmeans_oracle_sql(k: int = 8, iters: int = 3, dim: int = 64) -> str:
    """Unrolled fixed-iteration Lloyd's in ANSI SQL. Exactly mirrors
    operators.kmeans.kmeans(quantize=6): integer-quantized components,
    exact integer sums, one IEEE division per centroid component, ordered
    distance folds, ties toward the lower centroid id."""
    dist = (
        "list_reduce(list_transform(range(1, {d} + 1),"
        " i -> (e.qv[i] - c.cv[i]) * (e.qv[i] - c.cv[i])),"
        " (x, y) -> x + y)"
    ).format(d=dim)
    parts = [
        "WITH e AS (",
        "  SELECT vec_id,",
        "         list_transform(embedding, x -> floor(x::DOUBLE * 1000000 + 0.5)) AS qv",
        "  FROM embeddings",
        "),",
        "c0 AS (",
        "  SELECT row_number() OVER (ORDER BY vec_id) AS cl, qv AS cv",
        f"  FROM (SELECT vec_id, qv FROM e ORDER BY vec_id LIMIT {k})",
        ")",
    ]
    for j in range(1, iters + 1):
        prev = f"c{j - 1}"
        parts.append(f""",
a{j} AS (
  SELECT vec_id, qv, cl, dist,
         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rk
  FROM (
    SELECT e.vec_id, e.qv, c.cl, {dist} AS dist
    FROM e CROSS JOIN {prev} c
  )
)""")
        if j < iters:  # the last assignment pass needs no centroid update
            parts.append(f""",
m{j} AS (
  SELECT cl, list(sm / cnt ORDER BY dim) AS cv
  FROM (
    SELECT cl, i AS dim, SUM(qv[i]) AS sm, COUNT(*) AS cnt
    FROM (SELECT cl, qv FROM a{j} WHERE rk = 1) t,
         UNNEST(range(1, {dim} + 1)) AS u(i)
    GROUP BY cl, i
  )
  GROUP BY cl
),
c{j} AS (
  SELECT c.cl, coalesce(m.cv, c.cv) AS cv
  FROM {prev} c LEFT JOIN m{j} m ON m.cl = c.cl
)""")
    parts.append(f"""
SELECT vec_id, CAST(cl AS BIGINT) AS cluster, dist AS sq_dist
FROM a{iters} WHERE rk = 1
""")
    return "\n".join(parts)


@q(
    "kmeans_assignments",
    _kmeans_oracle_sql(),
    "distributed k-means over embeddings: deterministic init (k smallest "
    "ids), literal-broadcast assignment pass + one groupBy per iteration; "
    "quantize=6 makes the fixed-iteration run bit-reproducible, so the "
    "oracle unrolls the same 3 Lloyd iterations in SQL",
)
def kmeans_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.kmeans import kmeans

    e = load(spark, sf_dir, "embeddings")
    return kmeans(spread(spark, e, input_bytes=table_bytes(sf_dir, "embeddings")), k=8, max_iterations=3, quantize=6)


def _pq_oracle_sql(
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    quantize: int = 6,
    qmod: int = 25,
    topk: int = 10,
) -> str:
    """Unrolled product-quantization ADC in ANSI SQL: per block, the
    same fixed-iteration Lloyd's chain as :func:`_kmeans_oracle_sql`
    on the block's sub-vector slice; then codes (rk=1 of the final
    assignment), per-query LUTs against the final codebook, ADC as the
    block-ordered sum of LUT lookups, and a (adc, neighbor) rank
    window. Bit-reproducible for the same reasons as the kmeans
    oracle: quantized integer components, exact integer sums, one IEEE
    division per centroid component, ordered distance folds, and a
    fixed ``l1 + l2 + l3 + l4`` block addition order."""
    sub = dim // m
    scale = 10 ** quantize
    dist = (
        "list_reduce(list_transform(range(1, {s} + 1),"
        " i -> (t.sv[i] - c.cv[i]) * (t.sv[i] - c.cv[i])),"
        " (x, y) -> x + y)"
    ).format(s=sub)
    parts = [
        "WITH e AS (",
        "  SELECT vec_id,",
        f"         list_transform(embedding, x -> floor(x::DOUBLE * {scale} + 0.5)) AS qv",
        "  FROM embeddings",
        "),",
        f"q AS (SELECT vec_id, qv FROM e WHERE vec_id % {qmod} = 0)",
    ]
    for b in range(1, m + 1):
        lo, hi = (b - 1) * sub + 1, b * sub
        parts.append(f""",
eb{b} AS (SELECT vec_id, qv[{lo}:{hi}] AS sv FROM e),
qb{b} AS (SELECT vec_id, qv[{lo}:{hi}] AS sv FROM q),
c0_{b} AS (
  SELECT row_number() OVER (ORDER BY vec_id) AS cl, sv AS cv
  FROM (SELECT vec_id, sv FROM eb{b} ORDER BY vec_id LIMIT {k})
)""")
        for j in range(1, iters + 1):
            prev = f"c{j - 1}_{b}"
            parts.append(f""",
a{j}_{b} AS (
  SELECT vec_id, sv, cl, dist,
         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rk
  FROM (SELECT t.vec_id, t.sv, c.cl, {dist} AS dist
        FROM eb{b} t CROSS JOIN {prev} c)
)""")
            if j < iters:
                parts.append(f""",
m{j}_{b} AS (
  SELECT cl, list(sm / cnt ORDER BY dim) AS cv
  FROM (
    SELECT cl, i AS dim, SUM(sv[i]) AS sm, COUNT(*) AS cnt
    FROM (SELECT cl, sv FROM a{j}_{b} WHERE rk = 1) t,
         UNNEST(range(1, {sub} + 1)) AS u(i)
    GROUP BY cl, i
  )
  GROUP BY cl
),
c{j}_{b} AS (
  SELECT c.cl, coalesce(mm.cv, c.cv) AS cv
  FROM {prev} c LEFT JOIN m{j}_{b} mm ON mm.cl = c.cl
)""")
        parts.append(f""",
code_{b} AS (SELECT vec_id, cl AS code FROM a{iters}_{b} WHERE rk = 1),
lut{b} AS (
  SELECT t.vec_id AS qid, c.cl, {dist} AS d
  FROM qb{b} t CROSS JOIN c{iters - 1}_{b} c
)""")
    code_cols = ", ".join(f"cb{b}.code AS k{b}" for b in range(1, m + 1))
    code_joins = " ".join(
        f"JOIN code_{b} cb{b} USING (vec_id)" for b in range(2, m + 1)
    )
    adc_sum = " + ".join(f"l{b}.d" for b in range(1, m + 1))
    lut_joins = " ".join(
        f"JOIN lut{b} l{b} ON l{b}.qid = q.vec_id AND l{b}.cl = x.k{b}"
        for b in range(1, m + 1)
    )
    parts.append(f""",
codes AS (
  SELECT cb1.vec_id, {code_cols}
  FROM code_1 cb1 {code_joins}
),
s AS (
  SELECT q.vec_id AS qid, x.vec_id AS cid, {adc_sum} AS adc
  FROM q JOIN codes x ON q.vec_id <> x.vec_id
  {lut_joins}
),
r AS (
  SELECT qid, cid, adc,
         row_number() OVER (PARTITION BY qid ORDER BY adc, cid) AS rk
  FROM s
)
SELECT CAST(qid AS BIGINT) AS query_id, CAST(cid AS BIGINT) AS neighbor_id,
       CAST(rk AS BIGINT) AS rank, adc AS adc_dist
FROM r WHERE rk <= {topk}
""")
    return "\n".join(parts)


@q(
    "ann_pq_adc_topk",
    _pq_oracle_sql(),
    "product-quantization ANN (Jegou et al. TPAMI'11): m=4 sub-space "
    "codebooks of k=8 centroids each (2 unrolled Lloyd iterations on "
    "quantized sub-vectors — the kmeans_assignments determinism "
    "contract per block), corpus compressed to 4 small codes per "
    "vector, queries score the compressed table via asymmetric "
    "distance computation (per-query m x k LUT as ONE array literal "
    "expression, ADC = 4 array lookups added in block order) and rank "
    "top-10 with ties toward the lower neighbor id — the "
    "memory-compression arm of the ANN family (the codes table is "
    "~64x smaller than the raw corpus; IVF-PQ composes it with the "
    "coarse inverted lists, see operators/pq.ivf_pq_topk)",
)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pq import pq_assign, pq_topk, pq_train

    e = load(spark, sf_dir, "embeddings")
    corpus = spread(spark, e, input_bytes=table_bytes(sf_dir, "embeddings"))
    queries = e.filter(F.col("vec_id") % 25 == 0)
    books = pq_train(corpus, dim=64, m=4, k=8, max_iterations=2, quantize=6)
    codes = pq_assign(corpus, books, dim=64, quantize=6)
    return pq_topk(queries, codes, books, dim=64, topk=10, quantize=6)
