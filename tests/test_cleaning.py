"""Parity tests: native cleaning expressions vs reference UDF semantics."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from pyspark_entity_resolution_spark.functions import cleaning as C

from .reference_semantics import (
    oracle_clean_record,
    oracle_num_authors,
    oracle_remove_accents,
    oracle_remove_nums,
    oracle_remove_stopwords,
    oracle_sort_authors,
)

CASES = [
    None,
    "",
    " ",
    "plain text",
    "Zaphod Beeblebrox, Arthur Dent",
    "Dent Arthur,  Ford   Prefect ,Trillian Astra",
    "J0hn Sm1th, Ma77ias Bro42wn",
    'titles with "quotes" and (parens) + plus/slash-dash',
    "the quick brown fox jumps over a lazy dog",
    "query—optimization—in the large",   # em-dash separators
    "éclair über niño façade Ångström",
    "  padded   with	tabs  and   spaces ",
    "don't stop believing, won't you",
    '"the start quote survives stopword check',
    "comma, stays, here",
    "digits 123 mixed 4ever 2gether",
    "!!!only???punct###",
    "a—b—c",
    "name with ’fancy’ “quotes” ″prime″",
    "trailing comma,",
    ",leading comma",
    "ACM SIGMOD Conference",
    "Proc. VLDB Endow. 12(3): 100-200",
]


def _run(spark, expr_builder, values):
    schema = StructType([StructField("s", StringType(), True)])
    df = spark.createDataFrame([(v,) for v in values], schema)
    rows = df.select(F.col("s"), expr_builder(F.col("s")).alias("out")).collect()
    return {r["s"]: r["out"] for r in rows}


@pytest.mark.parametrize(
    "expr_builder,oracle",
    [
        (C.sort_authors, oracle_sort_authors),
        (C.remove_nums, oracle_remove_nums),
        (C.clean_record, oracle_clean_record),
        (C.remove_accents, oracle_remove_accents),
        (C.remove_stopwords, oracle_remove_stopwords),
    ],
    ids=["sort_authors", "remove_nums", "clean_record", "remove_accents", "remove_stopwords"],
)
def test_cleaning_parity(spark, expr_builder, oracle):
    got = _run(spark, expr_builder, CASES)
    for value in CASES:
        assert got[value] == oracle(value), f"mismatch for {value!r}: {got[value]!r}"


def test_num_authors(spark):
    got = _run(spark, C.get_num_authors, CASES)
    for value in CASES:
        assert got[value] == oracle_num_authors(value), f"mismatch for {value!r}"


def test_composition_title_and_authors(spark):
    """The full composition order from reference src/cleaning.py:118-134."""
    values = [
        "Efficient Query Processing in the Présence of Noise",
        "Müller Hans, José García-Pérez, O'Brien   Liam 3rd",
        None,
    ]
    title_expr = lambda c: C.remove_stopwords(C.remove_accents(c))
    authors_expr = lambda c: C.sort_authors(
        C.remove_accents(C.clean_record(C.remove_nums(c)))
    )
    got_title = _run(spark, title_expr, values)
    got_authors = _run(spark, authors_expr, values)
    for v in values:
        expect_title = oracle_remove_stopwords(oracle_remove_accents(v)) if v else v
        expect_authors = (
            oracle_sort_authors(
                oracle_remove_accents(oracle_clean_record(oracle_remove_nums(v)))
            )
            if v
            else v
        )
        assert got_title[v] == expect_title
        assert got_authors[v] == expect_authors
