"""Vector column helpers — built-in higher-order functions only.

Embeddings arrive as ``array<float>``; all arithmetic is done in
float64 after an explicit cast (float32 summation order differs across
engines and even across Spark partitionings). ``F.aggregate`` folds
left-to-right, giving a deterministic summation order, and cosines are
rounded to 6 decimals wherever they cross an engine boundary so
last-ulp noise can't flip a hash comparison.

At 100 TB these expressions run inside whole-stage codegen — no Python,
no UDF. For very high dimensions a Pandas-UDF BLAS path can win; keep
that as an opt-in, not the default.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-to-right folded dot product (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(col: Column) -> Column:
    return F.sqrt(
        F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine similarity from precomputed norms, rounded for
    cross-engine comparability."""
    return F.round(dot(a, b) / (norm_a * norm_b), 6)
