"""Similarity measures as Spark column expressions.

Re-expressions of the reference's scalar similarity helpers as pure SQL
expressions (stay inside whole-stage codegen; no Python on the hot path):

  - norm_levenshtein      <- reference src/string_matcher.py:41-50
  - cosine_sim            <- reference src/compare_by_structure.py:71-90
  - binary_positive_sim   <- reference src/compare_by_structure.py:92-101
  - set_context_sim       <- reference src/compare_by_structure.py:103-109
  - interval_overlap_sim  <- reference src/compare_by_structure.py:201-261
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def norm_levenshtein(s1: Column | str, s2: Column | str) -> Column:
    """Normalized Levenshtein similarity in [0, 1].

    ``1 - lev(a, b) / max(len(a), len(b))``; 1.0 when both empty.
    """
    a, b = _c(s1), _c(s2)
    denom = F.greatest(F.length(a), F.length(b))
    return F.when(denom == 0, F.lit(1.0)).otherwise(
        1.0 - F.levenshtein(a, b) / denom
    )


def cosine_sim(v1: Column | str, v2: Column | str) -> Column:
    """Cosine similarity of two equal-length numeric arrays.

    Edge cases follow the reference semantics: identical vectors -> 1.0
    (even all-zero), exactly one zero-norm vector -> 0.0, both zero-norm
    -> 1.0. Uses higher-order functions (zip_with/aggregate), all JVM-side.
    """
    a, b = _c(v1), _c(v2)
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sq = lambda v: F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)  # noqa: E731
    norm_a, norm_b = F.sqrt(sq(a)), F.sqrt(sq(b))
    return (
        F.when((norm_a == 0.0) & (norm_b == 0.0), F.lit(1.0))
        .when((norm_a == 0.0) | (norm_b == 0.0), F.lit(0.0))
        .otherwise(dot / (norm_a * norm_b))
    )


def binary_positive_sim(v1: Column | str, v2: Column | str) -> Column:
    """Count of positions where both are 1, over max(1, count either is 1).

    Operates on arrays of 0/1 ints.
    """
    a, b = _c(v1), _c(v2)
    both = F.aggregate(
        F.zip_with(a, b, lambda x, y: ((x == 1) & (y == 1)).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    either = F.aggregate(
        F.zip_with(a, b, lambda x, y: ((x == 1) | (y == 1)).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return both / F.greatest(F.lit(1), either)


def set_context_sim(a1: Column | str, a2: Column | str) -> Column:
    """|intersection| / max(|a|, |b|) over two arrays treated as sets."""
    a, b = _c(a1), _c(a2)
    return F.size(F.array_intersect(a, b)) / F.greatest(F.size(a), F.size(b))


def interval_overlap_sim(
    min1: Column | str,
    max1: Column | str,
    min2: Column | str,
    max2: Column | str,
    equivalence_rating: float = 1.0,
    overlap_rating: float = 0.7,
) -> Column:
    """Interval-overlap similarity over nullable bounds.

    CASE tree matching the reference's bounded / unbounded / half-bounded
    cases. Returns a struct with ``sim`` (double) and ``disjoint``
    (boolean flag, set when intervals provably do not intersect).
    """
    lo1, hi1, lo2, hi2 = _c(min1), _c(max1), _c(min2), _c(max2)
    bounded1 = lo1.isNotNull() & hi1.isNotNull()
    bounded2 = lo2.isNotNull() & hi2.isNotNull()
    unbounded1 = lo1.isNull() & hi1.isNull()
    unbounded2 = lo2.isNull() & hi2.isNull()
    half1 = ~bounded1 & ~unbounded1
    half2 = ~bounded2 & ~unbounded2

    eq = (lo1.eqNullSafe(lo2)) & (hi1.eqNullSafe(hi2)) & ~(unbounded1 & unbounded2)
    overlap = F.greatest(
        F.lit(0.0), F.least(hi1, hi2) - F.greatest(lo1, lo2)
    )
    span = F.greatest(hi1 - lo1, hi2 - lo2)
    proven_disjoint = (
        (lo1.isNotNull() & hi2.isNotNull() & (lo1 > hi2))
        | (hi1.isNotNull() & lo2.isNotNull() & (lo2 > hi1))
    )
    half_touch = (
        (lo1.isNotNull() & hi2.isNotNull() & (lo1 < hi2))
        | (hi1.isNotNull() & lo2.isNotNull() & (lo2 < hi1))
        | (lo1.isNotNull() & lo2.isNotNull())
        | (hi1.isNotNull() & hi2.isNotNull())
    )
    half_eq = (
        (lo1.isNotNull() & lo2.isNotNull() & (lo1 == lo2))
        | (hi1.isNotNull() & hi2.isNotNull() & (hi1 == hi2))
    )

    sim = (
        F.when(eq, F.lit(equivalence_rating))
        .when(unbounded1 & unbounded2, F.lit(equivalence_rating))
        .when(
            bounded1 & bounded2,
            F.when(span == 0, F.lit(0.0)).otherwise(overlap / span),
        )
        .when(unbounded1 | unbounded2, F.lit(0.0))
        .when(
            half1 & half2,
            F.when(half_eq, F.lit(equivalence_rating))
            .when(proven_disjoint, F.lit(0.0))
            .when(half_touch, F.lit(overlap_rating))
            .otherwise(F.lit(0.0)),
        )
        .otherwise(  # one bounded, one half-bounded
            F.when(proven_disjoint, F.lit(0.0))
            .when(
                (lo1.isNotNull() & hi2.isNotNull() & (lo1 < hi2))
                | (hi1.isNotNull() & lo2.isNotNull() & (lo2 < hi1)),
                F.lit(overlap_rating),
            )
            .otherwise(F.lit(0.0))
        )
    )
    # the reference raises its disjoint flag only in the half-bounded /
    # one-bounded branches (:231-243); two disjoint *bounded* intervals
    # just score 0 (:228-230)
    flag = proven_disjoint & ~eq & ~(bounded1 & bounded2)
    return F.struct(sim.alias("sim"), flag.alias("disjoint"))
