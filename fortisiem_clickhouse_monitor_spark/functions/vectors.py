"""Vector math over ``array<float>`` columns, expressed with built-in
higher-order functions (``zip_with`` + ``aggregate``) so the arithmetic
runs JVM-side inside whole-stage codegen — no Python round-trip
(SURVEY.md §2.11: zero-UDF goal; pandas_udf is the documented fallback
if profiles ever show these dominating).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential left-to-right dot product (deterministic FP order)."""
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))


def make_dot_pandas():
    """Arrow-batched dot product — see functions/arrow_udfs.py (kept in
    a separate module because pandas_udf type hints must not be
    PEP 563-stringified)."""
    from .arrow_udfs import dot_pandas

    return dot_pandas
