"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the operator-inventory queries and their DuckDB
oracles (see pyspark_entity_resolution_spark/plans/*).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from pyspark_entity_resolution_spark.plans.registry import all_queries

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: near-duplicate document matching — block by (lang, source),
    score Levenshtein prefix + token-set Jaccard, emit matched pairs."""
    specs = all_queries()
    name = "er_flagship_doc_matching" if "er_flagship_doc_matching" in specs else next(
        iter(specs)
    )
    return specs[name].fn(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.sql for name, spec in all_queries().items() if spec.sql is not None
    }
