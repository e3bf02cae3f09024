"""Vector math over ``array<float>`` embedding columns — pure JVM-side
expressions (``zip_with`` + left-fold ``aggregate``), no UDFs.

Determinism note: folds run in element order with a 0.0 initial value, so
the result is bit-identical to any engine that folds left in order
(DuckDB's ``list_reduce`` after the 0+x1 == x1 identity). Elements are
cast float->double (exact) before multiplication.

Construction-cost note (r11): when the operands are plain column NAMES,
each builder emits its whole expression through ONE ``F.expr`` call
instead of composing higher-order functions py4j-call by py4j-call.
The SQL text parses to the IDENTICAL Catalyst expressions (same folds,
same 0.0D init, same operand order — pinned by
``tests/test_vectors_sql.py``), but a ``paired_cosine`` build drops
from ~60 driver round-trips to 1. The ANN/PQ/k-means family builds
hundreds of these per query plan; the py4j chatter was 2.6 s of
``ann_methods_topk``'s 3.2 s plan-construction time (profiled, r11).
Column-typed operands keep the original composed path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _sql_ident(name: str) -> str:
    """Backquoted SQL identifier (column names here are simple, but
    quote anyway so ``__vnrm``-style names never collide with keywords)."""
    return "`" + name.replace("`", "``") + "`"


def _sql_as_double(name: str) -> str:
    return f"transform({_sql_ident(name)}, x -> cast(x as double))"


def _sql_dot(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({_sql_as_double(a)}, {_sql_as_double(b)}, "
        f"(x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
    )


def as_double(v: Column | str) -> Column:
    """Element-wise cast of a numeric array to double."""
    if isinstance(v, str):
        return F.expr(_sql_as_double(v))
    return F.transform(_col(v), lambda x: x.cast("double"))


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product via zip_with + ordered left fold (deterministic)."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(_sql_dot(a, b))
    return _fold_sum(F.zip_with(as_double(a), as_double(b), lambda x, y: x * y))


def l2_norm(v: Column | str) -> Column:
    """Euclidean norm via the same ordered fold as :func:`dot`."""
    if isinstance(v, str):
        return F.expr(
            f"sqrt(aggregate(transform({_sql_as_double(v)}, x -> x * x), "
            f"0.0D, (acc, x) -> acc + x))"
        )
    return F.sqrt(_fold_sum(F.transform(as_double(v), lambda x: x * x)))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL (not an error) for zero-norm vectors."""
    # try_divide: a zero-norm vector yields NULL instead of an ANSI
    # DIVIDE_BY_ZERO error (found by property testing; real embeddings
    # are never zero, but padded/missing rows can be)
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def paired_cosine(
    a_vec: Column | str,
    b_vec: Column | str,
    a_norm: Column | str,
    b_norm: Column | str,
) -> Column:
    """Cosine from a per-pair dot product and PRE-COMPUTED per-row norms.

    Bit-identical to :func:`cosine` (same fold, same ``|a|*|b|`` multiply
    order feeding the same ``try_divide``) — the only change is WHERE the
    norm fold runs: once per row on the linear join sides instead of once
    per candidate pair. On pair-quadratic verify stages (ANN, embedding
    near-dup) that removes two thirds of the per-pair array-fold work
    (measured 1.7x end-to-end on the x10 probe corpus)."""
    if all(isinstance(c, str) for c in (a_vec, b_vec, a_norm, b_norm)):
        return F.expr(
            f"try_divide({_sql_dot(a_vec, b_vec)}, "
            f"{_sql_ident(a_norm)} * {_sql_ident(b_norm)})"
        )
    return F.try_divide(dot(a_vec, b_vec), _col(a_norm) * _col(b_norm))


def vector_dim(v: Column | str) -> Column:
    """Array length as BIGINT."""
    return F.size(_col(v)).cast("bigint")
