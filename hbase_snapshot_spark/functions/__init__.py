"""Column-function helpers shared by the operator suite.  Everything is
built from JVM-side pyspark.sql.functions (no Python UDFs) so the hot
path stays inside whole-stage codegen."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """elementwise dot product of two array<float/double> columns"""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def word_tokens(text: Column) -> Column:
    """whitespace tokenization; empty string → empty array"""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def word_ngrams(tokens: Column, n: int) -> Column:
    """word n-gram shingles from a token array (space-joined)"""
    idx = F.sequence(F.lit(0), F.size(tokens) - n)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(tokens, i + j + 1) for j in range(n)]
    )
    return F.when(F.size(tokens) < n, F.array().cast("array<string>")).otherwise(
        F.transform(idx, gram)
    )


def hex_nibble_value(ch: Column) -> Column:
    """hex char -> 0..15 (portable across engines via strpos arithmetic)"""
    return F.instr(F.lit("0123456789abcdef"), ch) - 1


def hex4_to_int(h: Column) -> Column:
    """first 4 hex chars -> 16-bit int"""
    return (
        hex_nibble_value(F.substring(h, 1, 1)) * 4096
        + hex_nibble_value(F.substring(h, 2, 1)) * 256
        + hex_nibble_value(F.substring(h, 3, 1)) * 16
        + hex_nibble_value(F.substring(h, 4, 1))
    )
