"""Array/vector functions for the embeddings surface (SURVEY §2 Part B).

All JVM-side (higher-order functions compiled by Catalyst, no Python UDF in
the hot path): dot product as ``aggregate(zip_with(a, b, *), 0d, +)``, which
is a strict left fold — the same evaluation order as DuckDB's
``list_reduce``, so results are bit-comparable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: str | Column, b: str | Column) -> Column:
    """Elementwise dot product of two array<numeric> columns (double)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm2(a: str | Column) -> Column:
    """L2 norm."""
    return F.sqrt(dot(a, a))


def cosine_sim(a: str | Column, b: str | Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    d = dot(a, b)
    na, nb = norm2(a), norm2(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))
