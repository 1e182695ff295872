"""Embedding-vector Column functions (array<float>/array<double>), all
built-in ``F.zip_with``/``F.aggregate`` compositions — no Python UDFs, so
similarity search stays JVM-side; the DuckDB twins use list_* functions."""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["dot", "l2_norm", "cosine", "dot_sql", "l2_norm_sql", "cosine_sql"]


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    d = l2_norm(a) * l2_norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def dot_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        f"p -> p[1]::DOUBLE * p[2]::DOUBLE))"
    )


def l2_norm_sql(a: str) -> str:
    return f"sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE)))"


def cosine_sql(a: str, b: str) -> str:
    d = f"({l2_norm_sql(a)} * {l2_norm_sql(b)})"
    return f"CASE WHEN {d} > 0 THEN {dot_sql(a, b)} / {d} ELSE 0.0 END"
