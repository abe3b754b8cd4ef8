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


def baseline_alignment(
    labels1: DataFrame, labels2: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """Levenshtein-only floor alignment (reference
    src/baseline_string_matcher.py:56-63, wired for comparison reporting
    at src/prom.py:197-198): per element type, blocked string match on
    normalized labels, greedy 1:1 selection, every match labeled
    equivalence. Exists so the full pipeline's quality can be asserted
    AGAINST this floor — the reference reports both numbers side by side.
    """
    from prom_spark.functions.text import normalize_label
    from prom_spark.matchers.lexical import CLS, DP, OP
    from prom_spark.operators.selection import greedy_one_to_one

    per_type = []
    for et in (CLS, OP, DP):
        l1 = labels1.filter(F.col("elem_type") == et).select(
            "iri", normalize_label(F.col("label")).alias("norm")
        )
        l2 = labels2.filter(F.col("elem_type") == et).select(
            "iri", normalize_label(F.col("label")).alias("norm")
        )
        scored = string_match(
            l1.withColumnRenamed("iri", "iri1").withColumnRenamed("norm", "n1"),
            l2.withColumnRenamed("iri", "iri2").withColumnRenamed("norm", "n2"),
            "iri1", "iri2", "n1", "n2", threshold=threshold,
        )
        per_type.append(
            scored.select("iri1", "iri2", "rating").withColumn(
                "elem_type", F.lit(et)
            )
        )
    allc = per_type[0]
    for c in per_type[1:]:
        allc = allc.unionByName(c)
    return greedy_one_to_one(allc, uid1_col="iri1", uid2_col="iri2").withColumn(
        "relation", F.lit("equivalence")
    )
