"""PySpark-native entity-resolution & analytics engine.

A ground-up, Spark-first re-expression of the capabilities of the reference
repo ``Kristina-Pianykh/pyspark-entity-resolution`` (surveyed in SURVEY.md):

- AMiner tagged-text codec           -> :mod:`.sources.aminer`
- string cleaning (6 reference UDFs) -> native Column expressions in
  :mod:`.functions.cleaning` (one irreducible pandas_udf: accent folding)
- candidate blocking                 -> single equi-join on exploded block
  keys (:mod:`.operators.blocking`) instead of the reference's ~14-job
  driver loop (reference src/match.py:100-120)
- similarity + match rules           -> :mod:`.functions.similarity`,
  :mod:`.operators.matching`
- entity clustering                  -> distributed connected components
  (:mod:`.operators.clustering`) instead of driver-side DFS
  (reference src/clustering.py:6-54)
- representative pick + pivot        -> :mod:`.operators.resolve`
- precision/recall/F1 harness        -> :mod:`.operators.metrics`

Plus the large-scale training-data-pipeline extensions: deduplication
(exact / MinHash-LSH / SimHash / n-gram), similarity search over
embeddings, text analysis, multimodal column plumbing, and Structured
Streaming variants.

Everything is declarative DataFrame code: Catalyst handles pushdown,
pruning, join strategy, and AQE handles skew/coalescing at scale.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
