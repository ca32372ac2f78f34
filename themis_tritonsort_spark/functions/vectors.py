"""Vector math over array<float|double> columns — JVM-side (no Python
UDF): ``zip_with`` + a left-to-right ``aggregate`` fold, which is
deterministic and whole-stage-codegen friendly.  At 100 TB this is the
difference between a codegen'd loop over Arrow-packed arrays and a
Python round trip per row.

Everything is computed in double regardless of input element type so
the DuckDB oracle (``::DOUBLE[]`` casts) produces bit-identical sums.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def _fold_sum(arr: Column) -> Column:
    # Sequential left fold => deterministic summation order.
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(as_double(a), as_double(b), lambda x, y: x * y))


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_sq(a: Column, b: Column) -> Column:
    return _fold_sum(
        F.zip_with(as_double(a), as_double(b), lambda x, y: (x - y) * (x - y))
    )


def maxabs(a: Column) -> Column:
    """Largest absolute component (the symmetric-quantization scale)."""
    return F.array_max(F.transform(as_double(a), F.abs))


def sq8_quantize(a: Column) -> Column:
    """Symmetric per-vector int8 scalar quantization:
    ``q_i = floor(127 * v_i / max|v| + 0.5)`` (round-half-up, range
    [-127, 127]), zero vectors map to all zeros.

    This is the standard embedding-compression step for billion-vector
    ANN: 4x smaller than float32, and distance math becomes small-int
    multiply-adds.  The formula is plain double arithmetic + floor, so
    a SQL oracle reproduces it bit-for-bit.
    """
    v = as_double(a)
    m = maxabs(a)
    return F.when(
        m == F.lit(0.0), F.transform(v, lambda x: F.lit(0).cast("long"))
    ).otherwise(
        F.transform(v, lambda x: F.floor(F.lit(127.0) * x / m + F.lit(0.5)))
    )


def idot(a: Column, b: Column) -> Column:
    """Exact integer dot product over array<long> columns (the
    quantized-vector fast path: no floating point until the final
    normalization)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
