"""Cross-engine vector math over array<float> embedding columns.

Cosine similarity is computed in double precision with a sequential
left-fold in element order on both engines, so the results are
bit-identical (same IEEE operations in the same order) — the oracle can
compare rounded values safely.

Spark-side this is pure Catalyst (``zip_with`` + ``aggregate``): the
brute-force top-k scan stays in whole-stage codegen, no Python. That is
the correct baseline at scale — one broadcast of the query vector, one
map-side pass, one ``orderBy().limit(k)`` (Spark's TakeOrdered, a
per-partition top-k + driver merge, no full sort shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = [
    "dot",
    "dot_sql",
    "cosine_similarity",
    "cosine_similarity_sql",
    "l2sq",
    "l2sq_sql",
]


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0::double, "
        f"list_transform(range(1, len({a}) + 1), "
        f"i -> {a}[i]::double * {b}[i]::double)), (acc, x) -> acc + x)"
    )


def l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance, left fold in array order (cross-engine
    bit-identical with ``l2sq_sql``)."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2sq_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0::double, "
        f"list_transform(range(1, len({a}) + 1), "
        f"i -> ({a}[i]::double - {b}[i]::double) "
        f"* ({a}[i]::double - {b}[i]::double))), (acc, x) -> acc + x)"
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / F.sqrt(dot(a, a)) / F.sqrt(dot(b, b))


def cosine_similarity_sql(a: str, b: str) -> str:
    return (
        f"({dot_sql(a, b)} / sqrt({dot_sql(a, a)}) / sqrt({dot_sql(b, b)}))"
    )
