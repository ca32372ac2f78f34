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
