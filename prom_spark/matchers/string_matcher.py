"""Blocked string-similarity matching.

Distributed re-expression of the reference's StringMatcher
(reference src/string_matcher.py:30-50): all-pairs normalized
Levenshtein. At scale a blind cross join is the anti-pattern, so
candidate generation is *blocked* — pairs must share a character q-gram
and have compatible lengths (a true positive at similarity >= t always
shares grams and satisfies the length bound, so blocking is lossless for
the threshold case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prom_spark.functions.similarity import norm_levenshtein


def _grams(col: str, q: int) -> F.Column:
    # q-grams via substring positions (JVM-side; sequence+transform)
    c = F.col(col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.lit(1), F.length(c) - q + 1)),
            lambda i: c.substr(i, F.lit(q)),
        )
    )


def string_match(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_str: str,
    right_str: str,
    threshold: float = 0.0,
    blocked: bool = True,
    q: int = 2,
) -> DataFrame:
    """Score candidate pairs with normalized Levenshtein similarity.

    Returns (``left_key``, ``right_key``, both strings, rating). With
    ``blocked=True`` (default), candidates are pairs sharing at least one
    character q-gram AND with length ratio >= threshold — lossless for
    sim >= threshold > 0 since ``sim <= min(len)/max(len)`` and equal
    characters imply shared grams. With ``blocked=False`` the exact
    all-pairs reference semantics (cross join) is preserved — only for
    small dimension-table inputs.
    """
    l = left.select(F.col(left_key).alias("_k1"), F.col(left_str).alias("_s1"))
    r = right.select(F.col(right_key).alias("_k2"), F.col(right_str).alias("_s2"))

    if blocked and threshold > 0:
        lg = l.withColumn("_g", F.explode(_grams("_s1", q)))
        rg = r.withColumn("_g", F.explode(_grams("_s2", q)))
        pairs = (
            lg.join(rg, on="_g")
            .select("_k1", "_s1", "_k2", "_s2")
            .distinct()
            .filter(
                F.least(F.length("_s1"), F.length("_s2"))
                >= threshold * F.greatest(F.length("_s1"), F.length("_s2"))
            )
        )
    else:
        pairs = l.crossJoin(r)

    scored = pairs.withColumn("rating", norm_levenshtein("_s1", "_s2"))
    if threshold > 0:
        scored = scored.filter(F.col("rating") >= threshold)
    return scored.select(
        F.col("_k1").alias(left_key),
        F.col("_s1").alias(left_str),
        F.col("_k2").alias(right_key),
        F.col("_s2").alias(right_str),
        "rating",
    )
