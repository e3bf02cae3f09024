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
from ..functions.similarity import token_jaccard
from ..operators.clustering import connected_components
from .common import QuerySpec, load, spread

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
    "clean_sort_authors",
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
             ', ') AS sorted_authors
    FROM (
      SELECT c_custkey,
             concat(c_mktsegment, ' ', c_name, ', ', c_name, ' ', c_mktsegment)
               AS authors_like
      FROM customer
    )
    """,
    "D1 sort_authors as native higher-order-function expression "
    "(reference src/cleaning.py:46-56)",
)
def clean_sort_authors(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    authors_like = F.concat(
        F.col("c_mktsegment"), F.lit(" "), F.col("c_name"), F.lit(", "),
        F.col("c_name"), F.lit(" "), F.col("c_mktsegment"),
    )
    return c.select(
        "c_custkey", C.sort_authors(authors_like).alias("sorted_authors")
    )


@q(
    "clean_record_pack",
    f"""
    SELECT p_partkey,
           regexp_replace(p_name, '\\d', '', 'g') AS no_digits,
           trim(regexp_replace(
                  regexp_replace(concat(p_brand, '/', p_type, '-', p_name),
                                 '{_CLEAN_CLASS_SQL}', ' ', 'g'),
                  '\\s{{2,}}', ' ', 'g')) AS cleaned,
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


@q(
    "clean_remove_stopwords",
    f"""
    SELECT doc_id,
           regexp_replace(
             array_to_string(
               list_transform(
                 list_filter(string_split_regex(text, ' |—'),
                             w -> NOT list_contains([{_STOPWORDS_SQL}], w)),
                 w -> regexp_replace(regexp_replace(w, '"', '', 'g'),
                                     '^{_STRIP_CLASS_SQL}+|{_STRIP_CLASS_SQL}+$',
                                     '', 'g')),
               ' '),
             '\\s{{2,}}', ' ', 'g') AS no_stopwords
    FROM documents
    """,
    "D5 remove_stopwords as a single native expression with the vendored "
    "NLTK list as an array literal (reference src/cleaning.py:86-98)",
)
def clean_remove_stopwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", C.remove_stopwords(F.col("text")).alias("no_stopwords"))


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
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    a = c.select(
        F.col("c_custkey").alias("a_id"),
        F.col("c_name").alias("a_name"),
        F.col("c_nationkey").alias("nk"),
    )
    b = c.select(
        F.col("c_custkey").alias("b_id"),
        F.col("c_name").alias("b_name"),
        F.col("c_nationkey").alias("nk"),
    )
    return (
        spread(spark, a).join(b, on="nk")
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("scores", F.levenshtein("a_name", "b_name").cast("bigint"))
        .filter(F.col("scores") <= 2)
        .select("a_id", "b_id", "scores")
    )


@q(
    "jaccard_part_pairs",
    """
    WITH t AS (
      SELECT p_partkey, p_brand, string_split(p_name, ' ') AS toks FROM part
    )
    SELECT a.p_partkey AS a_id, b.p_partkey AS b_id,
           CAST(len(list_distinct(list_intersect(a.toks, b.toks))) AS DOUBLE)
             / len(list_distinct(a.toks || b.toks)) AS title_jaccard_sim
    FROM t a JOIN t b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE CAST(len(list_distinct(list_intersect(a.toks, b.toks))) AS DOUBLE)
             / len(list_distinct(a.toks || b.toks)) >= 0.3
    """,
    "F7 token-set Jaccard over blocked pairs (reference "
    "src/similarity.py:38-44); blocking key = brand",
)
def jaccard_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_name")
    a = p.select(
        F.col("p_partkey").alias("a_id"),
        F.col("p_name").alias("a_name"),
        F.col("p_brand").alias("brand"),
    )
    b = p.select(
        F.col("p_partkey").alias("b_id"),
        F.col("p_name").alias("b_name"),
        F.col("p_brand").alias("brand"),
    )
    return (
        spread(spark, a).join(b, on="brand")
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("title_jaccard_sim", token_jaccard("a_name", "b_name"))
        .filter(F.col("title_jaccard_sim") >= 0.3)
        .select("a_id", "b_id", "title_jaccard_sim")
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
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    a = c.select(
        F.col("c_custkey").alias("u"),
        F.col("c_name").alias("a_name"),
        F.col("c_nationkey").alias("nk"),
    )
    b = c.select(
        F.col("c_custkey").alias("v"),
        F.col("c_name").alias("b_name"),
        F.col("c_nationkey").alias("nk"),
    )
    edges = (
        spread(spark, a).join(b, on="nk")
        .filter(
            (F.col("u") != F.col("v"))
            & (F.levenshtein("a_name", "b_name") <= 1)
        )
        .select("u", "v")
    )
    labels = connected_components(edges, src="u", dst="v")
    return labels.select(
        F.col("node").cast("bigint").alias("node"),
        F.col("component").cast("bigint").alias("component"),
    )


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
    )
    a = d.select(
        F.col("doc_id").alias("a_id"), F.col("lang"), F.col("source"),
        F.col("text").alias("a_text"), F.col("toks").alias("a_toks"),
        F.col("n_toks").alias("a_n"),
    )
    b = d.select(
        F.col("doc_id").alias("b_id"), F.col("lang"), F.col("source"),
        F.col("text").alias("b_text"), F.col("toks").alias("b_toks"),
        F.col("n_toks").alias("b_n"),
    )
    jac = F.size(F.array_intersect("a_toks", "b_toks")).cast("double") / F.size(
        F.array_union("a_toks", "b_toks")
    )
    return (
        spread(spark, a).join(b, on=["lang", "source"])
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


# ---------------------------------------------------- accent folding --

@q(
    "clean_remove_accents",
    """
    SELECT c_custkey,
           strip_accents('café résumé naïve Ångström piñata façade ' || c_name)
             AS folded
    FROM customer
    """,
    "D4 remove_accents: NFKD fold via Arrow-vectorized pandas UDF — the "
    "engine's one Python hot-path op (reference src/cleaning.py:76-83); "
    "oracle uses strip_accents (equal on Latin accents)",
)
def clean_remove_accents(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    accented = F.concat(
        F.lit("café résumé naïve Ångström piñata façade "), F.col("c_name")
    )
    return c.select("c_custkey", C.remove_accents(accented).alias("folded"))


@q(
    "er_match_rule_bands",
    """
    WITH t AS (
      SELECT p_partkey, p_brand, p_name, p_type,
             CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_auth
      FROM part
    ),
    pairs AS (
      SELECT a.p_partkey AS a_id, b.p_partkey AS b_id,
             CAST(levenshtein(a.p_type, b.p_type) AS BIGINT) AS scores,
             a.n_auth AS a_n, b.n_auth AS b_n,
             a.p_name AS a_name, b.p_name AS b_name
      FROM t a JOIN t b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    )
    SELECT a_id, b_id, scores,
           CAST(len(list_distinct(list_intersect(string_split(a_name, ' '),
                                                 string_split(b_name, ' ')))) AS DOUBLE)
             / len(list_distinct(string_split(a_name, ' ') || string_split(b_name, ' ')))
             AS title_jaccard_sim
    FROM pairs
    WHERE scores >= 0 AND scores < 10
      AND ((scores = 0 AND a_n = b_n AND a_n > 0 AND b_n > 0)
           OR (scores = 0 AND a_n = 0 AND b_n = 0)
           OR (scores > 0 AND scores < 10 AND a_n = b_n))
      AND CAST(len(list_distinct(list_intersect(string_split(a_name, ' '),
                                                string_split(b_name, ' ')))) AS DOUBLE)
            / len(list_distinct(string_split(a_name, ' ') || string_split(b_name, ' ')))
          >= 0.6
    """,
    "P8/P9: the reference's exact three-band match rule + Jaccard "
    "threshold (reference src/similarity.py:47-74) over brand-blocked "
    "part pairs, via functions.similarity.match_rule",
)
def er_match_rule_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.similarity import match_rule

    p = load(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_name", "p_type",
        F.size(F.split("p_name", " ")).cast("bigint").alias("n_auth"),
    )
    a = p.select(
        F.col("p_partkey").alias("a_id"), F.col("p_brand").alias("brand"),
        F.col("p_name").alias("a_name"), F.col("p_type").alias("a_type"),
        F.col("n_auth").alias("a_n"),
    )
    b = p.select(
        F.col("p_partkey").alias("b_id"), F.col("p_brand").alias("brand"),
        F.col("p_name").alias("b_name"), F.col("p_type").alias("b_type"),
        F.col("n_auth").alias("b_n"),
    )
    pairs = (
        spread(spark, a).join(b, on="brand")
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("scores", F.levenshtein("a_type", "b_type").cast("bigint"))
    )
    return (
        pairs.filter((F.col("scores") >= 0) & (F.col("scores") < 10))
        .filter(match_rule("scores", "a_n", "b_n"))
        .withColumn("title_jaccard_sim", token_jaccard("a_name", "b_name"))
        .filter(F.col("title_jaccard_sim") >= 0.6)
        .select("a_id", "b_id", "scores", "title_jaccard_sim")
    )
