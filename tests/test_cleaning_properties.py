"""Property-based parity: native cleaning expressions vs Python oracles on
randomized inputs (hypothesis generates the corpus once; all samples run
through Spark in a single DataFrame pass)."""

import string

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from pyspark_entity_resolution_spark.functions import cleaning as C

from .reference_semantics import (
    oracle_clean_record,
    oracle_num_authors,
    oracle_remove_nums,
    oracle_remove_stopwords,
    oracle_sort_authors,
)

# alphabet mixing word chars, digits, punctuation, quotes, em-dash,
# accents, commas, whitespace — everything the cleaning ops react to
ALPHABET = (
    string.ascii_letters + string.digits + " ,—'\"“”’″`éüñà-()/#. "
    + string.punctuation
)

corpus = st.lists(
    st.text(alphabet=ALPHABET, min_size=0, max_size=60), min_size=1, max_size=60
)


def _run_batch(spark, expr_builder, values):
    schema = StructType([StructField("s", StringType(), True)])
    df = spark.createDataFrame([(v,) for v in values], schema)
    rows = df.select("s", expr_builder(F.col("s")).alias("out")).collect()
    # keyed by position (values can repeat)
    by_input = {}
    for r in rows:
        by_input.setdefault(r["s"], r["out"])
    return by_input


@settings(max_examples=8, deadline=None)
@given(corpus)
def test_property_parity(spark, values):
    pairs = [
        (C.sort_authors, oracle_sort_authors),
        (C.remove_nums, oracle_remove_nums),
        (C.clean_record, oracle_clean_record),
        (C.remove_stopwords, oracle_remove_stopwords),
    ]
    for expr_builder, oracle in pairs:
        got = _run_batch(spark, expr_builder, values)
        for v in values:
            assert got[v] == oracle(v), (expr_builder.__name__, repr(v))
    got_n = _run_batch(spark, C.get_num_authors, values)
    for v in values:
        assert got_n[v] == oracle_num_authors(v), repr(v)
