"""Vector math over ArrayType(FloatType) embedding columns — JVM-side.

Charter extension (SURVEY.md §2B): similarity search needs dot/norm/cosine
over ``array<float>``. All of these compile to Catalyst higher-order
functions (``zip_with`` + ``aggregate``) — whole-stage codegen, no Python,
no UDF serialization. Elementwise math is done in DOUBLE so results are
deterministic and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a, b) -> Column:
    """Sum_i a[i]*b[i], accumulated left-to-right in double."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a) -> Column:
    sq = F.transform(_c(a), lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def cosine(a, b) -> Column:
    """Cosine similarity; 0.0 when either side has zero norm."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


def l2_distance(a, b) -> Column:
    diffsq = F.zip_with(
        _c(a), _c(b), lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))
    )
    return F.sqrt(F.aggregate(diffsq, F.lit(0.0), lambda acc, v: acc + v))
