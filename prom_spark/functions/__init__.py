"""Scalar column-expression library (JVM-side, whole-stage-codegen friendly).

Every function here returns a pyspark Column built from built-in
``pyspark.sql.functions`` — no Python UDFs. These are the distributed
re-expressions of the reference's row-at-a-time scalar helpers.
"""

from prom_spark.functions.similarity import (
    norm_levenshtein,
    cosine_sim,
    binary_positive_sim,
    set_context_sim,
    interval_overlap_sim,
)
from prom_spark.functions.text import (
    normalize_label,
    tokenize,
    token_count,
    bpe_ish_token_count,
    doc_fingerprint,
    quality_score,
    english_stopword_ratio,
)

__all__ = [
    "norm_levenshtein",
    "cosine_sim",
    "binary_positive_sim",
    "set_context_sim",
    "interval_overlap_sim",
    "normalize_label",
    "tokenize",
    "token_count",
    "bpe_ish_token_count",
    "doc_fingerprint",
    "quality_score",
    "english_stopword_ratio",
]
