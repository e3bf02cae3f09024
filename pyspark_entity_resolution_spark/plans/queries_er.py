"""Entity-resolution operator queries with DuckDB oracles.

Exercises the cleaning expressions (D1-D6), Levenshtein + Jaccard scoring
(F6/F7), banded match rules (P8/P9), window-explosion blocking (the G4
rewrite), and distributed connected components (the G1 rewrite) on the
driver's testdata tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import cleaning as C
from ..operators.clustering import connected_components
from .common import QuerySpec, load, spread, table_bytes

QUERIES: dict[str, QuerySpec] = {}


def q(name: str, sql: str | None, doc: str = ""):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn=fn, sql=sql, doc=doc)
        return fn

    return deco


def _sql_quote_list(words: list[str]) -> str:
    return ", ".join("'" + w.replace("'", "''") + "'" for w in words)


from ..functions.cleaning import (  # noqa: E402
    CLEAN_RECORD_CHARS,
    TOKEN_STRIP_CHARS,
    regex_class,
)
from ..functions.stopwords import ENGLISH_STOPWORDS  # noqa: E402

_CLEAN_CLASS_SQL = regex_class(CLEAN_RECORD_CHARS).replace("'", "''")
_STRIP_CLASS_SQL = regex_class(TOKEN_STRIP_CHARS).replace("'", "''")
_STOPWORDS_SQL = _sql_quote_list(ENGLISH_STOPWORDS)


# ------------------------------------------------------- cleaning pack --

@q(
    "clean_customer_pack",
    f"""
    SELECT c_custkey,
           array_to_string(
             list_transform(
               string_split(authors_like, ','),
               n -> array_to_string(
                      list_sort(
                        list_transform(
                          list_filter(string_split(n, ' '), t -> t <> ''),
                          t -> trim(t))),
                      ' ')),
             ', ') AS sorted_authors,
           strip_accents('café résumé naïve Ångström piñata façade ' || c_name)
             AS folded
    FROM (
      SELECT c_custkey, c_name,
             concat(c_mktsegment, ' ', c_name, ', ', c_name, ' ', c_mktsegment)
               AS authors_like
      FROM customer
    )
    """,
    "D1 sort_authors as native higher-order-function expression "
    "(reference src/cleaning.py:46-56) + D4 remove_accents: NFKD fold via "
    "Arrow-vectorized pandas UDF — the engine's one Python hot-path op "
    "(reference src/cleaning.py:76-83); oracle uses strip_accents (equal "
    "on Latin accents)",
)
def clean_customer_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    authors_like = F.concat(
        F.col("c_mktsegment"), F.lit(" "), F.col("c_name"), F.lit(", "),
        F.col("c_name"), F.lit(" "), F.col("c_mktsegment"),
    )
    accented = F.concat(
        F.lit("café résumé naïve Ångström piñata façade "), F.col("c_name")
    )
    return c.select(
        "c_custkey",
        C.sort_authors(authors_like).alias("sorted_authors"),
        C.remove_accents(accented).alias("folded"),
    )


@q(
    "clean_record_pack",
    f"""
    SELECT p_partkey,
           regexp_replace(p_name, '\\d', '', 'g') AS no_digits,
           trim(regexp_replace(
                  regexp_replace(concat(p_brand, '/', p_type, '-', p_name),
                                 '{_CLEAN_CLASS_SQL}', ' ', 'g'),
                  '[ \\t\\n\\x0B\\f\\r]{{2,}}', ' ', 'g')) AS cleaned,
           CAST(CASE WHEN p_name IS NULL THEN 0
                     ELSE len(string_split(p_name, ',')) END AS BIGINT)
             AS num_authors
    FROM part
    """,
    "D2 remove_nums + D3 clean_record + D6 get_num_authors as native "
    "expressions (reference src/cleaning.py:59-73,111-115)",
)
def clean_record_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    messy = F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type"), F.lit("-"), F.col("p_name"))
    return p.select(
        "p_partkey",
        C.remove_nums(F.col("p_name")).alias("no_digits"),
        C.clean_record(messy).alias("cleaned"),
        C.get_num_authors(F.col("p_name")).cast("bigint").alias("num_authors"),
    )


# D5 remove_stopwords moved into queries_text.text_analysis_pack (it runs
# on the documents table with the rest of the per-doc text analysis).
REMOVE_STOPWORDS_SQL = f"""
           regexp_replace(
             array_to_string(
               list_transform(
                 list_filter(string_split_regex(text, ' |—'),
                             w -> NOT list_contains([{_STOPWORDS_SQL}], w)),
                 w -> regexp_replace(regexp_replace(w, '"', '', 'g'),
                                     '^{_STRIP_CLASS_SQL}+|{_STRIP_CLASS_SQL}+$',
                                     '', 'g')),
               ' '),
             '[ \\t\\n\\x0B\\f\\r]{{2,}}', ' ', 'g')
"""


# ----------------------------------------------------- similarity ops --

@q(
    "levenshtein_blocked_pairs",
    """
    SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS scores
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    """,
    "F6 Levenshtein scoring over blocked candidate pairs (reference "
    "src/similarity.py:65); blocking key = nation",
)
def levenshtein_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r10: blocked_levenshtein_pairs runs the bounded early-exit DP on
    # affix-stripped middles (strip_common_affixes: lev is invariant
    # under the corpus-global shared prefix/suffix, and on this
    # id-styled corpus that is 13 of 18 chars) — measured 31.2 -> 8.3 s
    # at sf1 with the identical 17M-row output, flipping the one row
    # DuckDB used to win (41.7 s) to a ~5x Spark win.
    # Measured-and-rejected candidate pruning on this dense-match
    # corpus: SymSpell del-2 neighborhood (r7: 97.9 vs 40.1 s) and
    # adaptive chunk-banding + del-1 variants + shifted-length keys
    # (r10: 59.1 vs 31.2 s, identical rows) — ~17M pairs REALLY match,
    # so candidates cannot undercut the output and the explode/dedup/
    # re-join machinery only adds cost. The blocked quadratic scan is
    # the right plan for dense matches; SymSpell stays the win for
    # SPARSE ed-1 matching (operators/matching.py
    # deletion_neighborhood_pairs).
    from ..operators.matching import blocked_levenshtein_pairs

    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    return blocked_levenshtein_pairs(
        spread(spark, c, input_bytes=table_bytes(sf_dir, "customer")), "c_custkey", "c_name",
        block_cols=["c_nationkey"], max_distance=2,
    )


# ------------------------------------------------------------ blocking --

@q(
    "blocking_window_explode",
    """
    SELECT o_orderkey,
           CAST(unnest(generate_series(
                  greatest(1995, EXTRACT(year FROM o_orderdate) - 2),
                  least(1999, EXTRACT(year FROM o_orderdate)))) AS BIGINT)
             AS window_start
    FROM orders
    WHERE EXTRACT(year FROM o_orderdate) BETWEEN 1995 AND 2001
    """,
    "G4 rewrite: records explode to overlapping rolling-window block keys "
    "(SURVEY.md §7.1 step 5); one equi-join replaces the driver loop",
)
def blocking_window_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    year = F.year("o_orderdate")
    lo, hi, n = 1995, 2001, 2
    w_lo = F.greatest(F.lit(lo), year - F.lit(n))
    w_hi = F.least(F.lit(hi - n), year)
    return (
        o.filter(year.between(lo, hi))
        .select(
            "o_orderkey",
            F.explode(
                F.sequence(w_lo.cast("bigint"), w_hi.cast("bigint"))
            ).alias("window_start"),
        )
    )


# ------------------------------------------------ connected components --

_CC_EDGE_SQL = """
  SELECT a.c_custkey AS u, b.c_custkey AS v
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey <> b.c_custkey
   AND levenshtein(a.c_name, b.c_name) <= 1
"""


@q(
    "connected_components_labels",
    f"""
    WITH RECURSIVE edges AS ({_CC_EDGE_SQL}),
    reach(u, v) AS (
      SELECT u, u FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT CAST(u AS BIGINT) AS node, CAST(MIN(v) AS BIGINT) AS component
    FROM reach GROUP BY u
    """,
    "G1 rewrite: distributed min-label-propagation connected components "
    "(replaces reference driver DFS, src/clustering.py:6-54); oracle is a "
    "recursive-CTE transitive closure",
)
def connected_components_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.matching import deletion_neighborhood_pairs

    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    # edge semantics: same nation, name Levenshtein <= 1. Generated via
    # deletion-neighborhood indexing (ONE equi-join on (nation, variant),
    # linear in rows) instead of the blocked self-join whose 9M-pair DP
    # scan dominated this query through round 2 (r2: 7.1 s -> r3: see
    # BENCH). CC symmetrizes internally, so a<b single-direction edges
    # suffice.
    edges = deletion_neighborhood_pairs(
        spread(spark, c, input_bytes=table_bytes(sf_dir, "customer")), "c_custkey", "c_name", block_cols=["c_nationkey"]
    ).select(F.col("a_id").alias("u"), F.col("b_id").alias("v"))
    labels = connected_components(edges, src="u", dst="v")
    return labels.select(
        F.col("node").cast("bigint").alias("node"),
        F.col("component").cast("bigint").alias("component"),
    )


def _cc_adaptive_sql(sf_dir: str) -> str:
    """Scale-aware CC oracle (see QuerySpec.adaptive_sql).

    The static recursive-CTE oracle materializes the full transitive
    closure — quadratic in component size, and the levenshtein<=1
    name graph is dense (sf1: ~77k edges per 6.4k-node nation), so the
    closure would be ~1e9 reach rows. Above gate scale this generator
    instead computes the SAME edge set with DuckDB's own levenshtein
    join, labels it with an INDEPENDENT sequential union-find
    (path-compressed, union-by-min so the root IS the component's
    minimum custkey — a different algorithm from the engine's
    distributed alternating-stars), materializes (node, component) to
    a temp parquet, and returns a SELECT over it. The static SQL stays
    the driver-contract oracle at gate scale;
    test_plan_shapes.test_cc_adaptive_oracle_equals_static pins this
    generator's labels equal to the recursive CTE's there.
    """
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = f"{sf_dir}/customer.parquet"
    if os.path.isdir(path):
        path = f"{path}/*.parquet"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW customer AS SELECT * FROM '{path}'")
    tbl = con.execute(
        f"SELECT u, v FROM ({_CC_EDGE_SQL}) WHERE u < v"
    ).fetch_arrow_table()
    us = tbl.column("u").to_pylist()
    vs = tbl.column("v").to_pylist()

    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    for u, v in zip(us, vs):
        ru, rv = find(u), find(v)
        if ru != rv:
            # union-by-min: both roots are their sets' minima by
            # induction, so the smaller root is the union's minimum
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    # node set = every edge endpoint, exactly the static oracle's
    # (its reach CTE seeds from each directed edge's source and the
    # <>-join emits both directions, so every endpoint is a seed)
    nodes = sorted(set(us) | set(vs))
    labels = [find(n) for n in nodes]
    # fresh mkstemp path in a per-user 0700 dir, never a fixed
    # predictable /tmp name: on a shared host a fixed path can be
    # pre-created/squatted by another user, and two concurrent check
    # runs against different data at the same sf_dir would race on one
    # file. The file is small (|nodes| rows) and intentionally not
    # cleaned up — the returned SQL reads it after this function exits.
    import tempfile

    tmpdir = os.path.join(
        tempfile.gettempdir(), f"spark_graft_cc_oracle_{os.getuid()}"
    )
    os.makedirs(tmpdir, mode=0o700, exist_ok=True)
    fd, out = tempfile.mkstemp(
        prefix="cc_oracle_", suffix=".parquet", dir=tmpdir
    )
    os.close(fd)
    pq.write_table(
        pa.table({"node": pa.array(nodes, pa.int64()),
                  "component": pa.array(labels, pa.int64())}),
        out,
    )
    return f"SELECT node, component FROM '{out}'"


QUERIES["connected_components_labels"].adaptive_sql = _cc_adaptive_sql


# ------------------------------------------------------------ flagship --

@q(
    "er_flagship_doc_matching",
    """
    WITH d AS (
      SELECT doc_id, lang, source, text,
             string_split(text, ' ') AS toks,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
      FROM documents
    )
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(levenshtein(substring(a.text, 1, 30), substring(b.text, 1, 30))
                AS BIGINT) AS scores,
           CAST(len(list_distinct(list_intersect(a.toks, b.toks))) AS DOUBLE)
             / len(list_distinct(a.toks || b.toks)) AS title_jaccard_sim
    FROM d a JOIN d b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE abs(a.n_toks - b.n_toks) <= 10
      AND CAST(len(list_distinct(list_intersect(a.toks, b.toks))) AS DOUBLE)
             / len(list_distinct(a.toks || b.toks)) >= 0.5
    """,
    "flagship: near-duplicate document matching — block by (lang, source), "
    "token-count band, token-set Jaccard threshold, Levenshtein prefix "
    "score (the reference match shape generalized to documents)",
)
def er_flagship_doc_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text",
        F.split("text", " ").alias("toks"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_toks"),
        F.size(F.array_distinct(F.split("text", " "))).alias("nd_toks"),
    )
    a = d.select(
        F.col("doc_id").alias("a_id"), F.col("lang"), F.col("source"),
        F.col("text").alias("a_text"), F.col("toks").alias("a_toks"),
        F.col("n_toks").alias("a_n"), F.col("nd_toks").alias("a_nd"),
    )
    b = d.select(
        F.col("doc_id").alias("b_id"), F.col("lang"), F.col("source"),
        F.col("text").alias("b_text"), F.col("toks").alias("b_toks"),
        F.col("n_toks").alias("b_n"), F.col("nd_toks").alias("b_nd"),
    )
    # distinct-set union size from per-doc distinct counts: one array pass
    # (intersect) per pair instead of intersect + union
    inter = F.size(F.array_intersect("a_toks", "b_toks"))
    jac = inter.cast("double") / (F.col("a_nd") + F.col("b_nd") - inter)
    return (
        spread(spark, a, input_bytes=table_bytes(sf_dir, "documents")).join(b, on=["lang", "source"])
        .filter((F.col("a_id") < F.col("b_id")) & (F.abs(F.col("a_n") - F.col("b_n")) <= 10))
        .withColumn("title_jaccard_sim", jac)
        .filter(F.col("title_jaccard_sim") >= 0.5)
        .select(
            "a_id",
            "b_id",
            F.levenshtein(
                F.substring("a_text", 1, 30), F.substring("b_text", 1, 30)
            ).cast("bigint").alias("scores"),
            "title_jaccard_sim",
        )
    )


@q(
    "er_similarity_pairs",
    """
    WITH t AS (
      SELECT p_partkey, p_brand, p_name, p_type,
             string_split(p_name, ' ') AS toks,
             CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_auth
      FROM part
    ),
    pairs AS (
      SELECT a.p_partkey AS a_id, b.p_partkey AS b_id,
             CAST(levenshtein(a.p_type, b.p_type) AS BIGINT) AS lev,
             a.n_auth AS a_n, b.n_auth AS b_n,
             CAST(len(list_distinct(list_intersect(a.toks, b.toks))) AS DOUBLE)
               / len(list_distinct(a.toks || b.toks)) AS jac
      FROM t a JOIN t b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    )
    SELECT 'jaccard03' AS rule, a_id, b_id, CAST(NULL AS BIGINT) AS scores,
           jac AS title_jaccard_sim
    FROM pairs WHERE jac >= 0.3
    UNION ALL
    SELECT 'banded', a_id, b_id, lev, jac
    FROM pairs
    WHERE lev >= 0 AND lev < 10
      AND ((lev = 0 AND a_n = b_n AND a_n > 0 AND b_n > 0)
           OR (lev = 0 AND a_n = 0 AND b_n = 0)
           OR (lev > 0 AND lev < 10 AND a_n = b_n))
      AND jac >= 0.6
    """,
    "F7 token-set Jaccard over brand-blocked pairs (reference "
    "src/similarity.py:38-44) + P8/P9: the reference's exact three-band "
    "match rule + Jaccard threshold (src/similarity.py:47-74) via "
    "functions.similarity.match_rule, tagged by rule",
)
def er_similarity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.similarity import match_rule

    # r11: tokenize ONCE PER ROW before the join (array_distinct of the
    # token_jaccard split) and recover the set-union size per pair from
    # the per-row distinct counts — |A∪B| = |A|+|B|-|A∩B| — so each of
    # the 201.7M sf1 pairs pays ONE array_intersect instead of two
    # regex splits + intersect + union (the er_flagship_doc_matching
    # trick; identical doubles — same integer numerator and
    # denominator). First-ever timing of this row in
    # CORRECTNESS_SF1_r11 read Spark 296.5 s vs DuckDB 138.6 s; this
    # closes that gap from the per-pair kernel side.
    p = load(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_type",
        F.array_distinct(F.split("p_name", r"\s+")).alias("toks"),
        F.size(F.split("p_name", " ")).cast("bigint").alias("n_auth"),
    ).withColumn("nd", F.size("toks"))
    a = p.select(
        F.col("p_partkey").alias("a_id"), F.col("p_brand").alias("brand"),
        F.col("toks").alias("a_toks"), F.col("nd").alias("a_nd"),
        F.col("p_type").alias("a_type"), F.col("n_auth").alias("a_n"),
    )
    b = p.select(
        F.col("p_partkey").alias("b_id"), F.col("p_brand").alias("brand"),
        F.col("toks").alias("b_toks"), F.col("nd").alias("b_nd"),
        F.col("p_type").alias("b_type"), F.col("n_auth").alias("b_n"),
    )
    inter = F.size(F.array_intersect("a_toks", "b_toks"))
    pairs = (
        spread(spark, a, input_bytes=table_bytes(sf_dir, "part")).join(b, on="brand")
        .filter(F.col("a_id") < F.col("b_id"))
        # bounded: only the banded branch reads lev, and it filters
        # 0 <= lev < 10, so distances > 9 can report -1 without changing
        # any surviving row
        .withColumn("lev", F.levenshtein("a_type", "b_type", 9).cast("bigint"))
        .withColumn(
            "jac", inter / (F.col("a_nd") + F.col("b_nd") - inter)
        )
    )
    # ONE pass over the blocked pairs: a plain union of the two rule
    # branches re-evaluates the brand join + levenshtein + jaccard per
    # branch (Spark unions don't share subplans); emitting both rules
    # from a conditional-array explode keeps one join, one kernel
    # evaluation, and the same output rows (r7: 3.65 -> 1.71 s min-of-4
    # at sf0.1, oracle-identical).
    jac03_row = F.when(
        F.col("jac") >= 0.3,
        F.struct(
            F.lit("jaccard03").alias("rule"),
            F.lit(None).cast("bigint").alias("scores"),
        ),
    )
    banded_row = F.when(
        (F.col("lev") >= 0)
        & (F.col("lev") < 10)
        & match_rule("lev", "a_n", "b_n")
        & (F.col("jac") >= 0.6),
        F.struct(F.lit("banded").alias("rule"), F.col("lev").alias("scores")),
    )
    return (
        pairs.select(
            "a_id", "b_id", "jac",
            F.explode(F.array(jac03_row, banded_row)).alias("__r"),
        )
        .filter(F.col("__r").isNotNull())
        .select(
            F.col("__r.rule").alias("rule"),
            "a_id",
            "b_id",
            F.col("__r.scores").alias("scores"),
            F.col("jac").alias("title_jaccard_sim"),
        )
    )
