"""Column-expression builders (the engine's scalar-function layer).

Everything here returns :class:`pyspark.sql.Column` built from JVM-side
``pyspark.sql.functions`` so the hot path stays inside whole-stage codegen.
The single exception is :func:`cleaning.remove_accents` (Unicode NFKD has no
JVM-native Spark builtin), implemented as an Arrow-vectorized pandas UDF.
"""
