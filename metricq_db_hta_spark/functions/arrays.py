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
    """Elementwise dot product of two array<numeric> columns (double).

    Generic fold form — works for any length, but higher-order functions
    are CodegenFallback (interpreted, ~µs/element). For known, fixed
    dimension use :func:`dot_flat`, which is 100% whole-stage-codegen.
    """
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def dot_flat(a: str | Column, b: str | Column, dim: int) -> Column:
    """Dot product as a flat left-associative sum of ``dim`` products:
    ``(0.0 + a[0]*b[0]) + a[1]*b[1] + ...``.

    Bit-identical to :func:`dot` (same evaluation order, same per-element
    cast->multiply->add), but a plain expression tree that Tungsten
    compiles — measured ~100x faster per pair than the interpreted fold.

    For string column names the whole expression is built as ONE SQL string
    parsed by a single ``F.expr`` call. Building it with Column operator
    overloads instead costs ~3*dim py4j round trips *per call* — measured
    ~1 s/call at dim=64, utterly dominating the query (driver-side, before
    any execution). Column inputs take that slow path; pass names in hot
    code.
    """
    if isinstance(a, str) and isinstance(b, str):
        # keep the per-element CAST: float*float then widening rounds
        # differently from widening-then-double-multiply (the oracle casts
        # the list to DOUBLE first). Callers that pre-cast the column to
        # array<double> lose nothing — Catalyst folds the no-op casts away
        # before codegen.
        terms = "".join(
            f" + CAST(`{a}`[{i}] AS DOUBLE) * CAST(`{b}`[{i}] AS DOUBLE)"
            for i in range(dim)
        )
        return F.expr(f"0.0D{terms}")
    ca, cb = _c(a), _c(b)
    acc: Column = F.lit(0.0)
    for i in range(dim):
        acc = acc + ca.getItem(i).cast("double") * cb.getItem(i).cast("double")
    return acc


def norm2_flat(a: str | Column, dim: int) -> Column:
    """L2 norm via the codegen-friendly flat dot."""
    return F.sqrt(dot_flat(a, a, dim))


def norm2(a: str | Column) -> Column:
    """L2 norm."""
    return F.sqrt(dot(a, a))


def cosine_sim(a: str | Column, b: str | Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    d = dot(a, b)
    na, nb = norm2(a), norm2(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))
