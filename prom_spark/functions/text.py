"""Text-analysis column expressions (JVM-side; no Python UDFs).

Covers the reference's label normalization (camelCase/underscore/space
tokenizer, reference src/translate_onto.py:114-117; lowercase at
src/compare_by_labels.py:136) plus the training-data-pipeline text ops:
token counting, quality scoring, fingerprinting, stopword-based language
heuristics. All expressions are chosen so a DuckDB oracle can compute the
identical value (md5, regexp, length arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small english stopword list for the language-ID heuristic. Kept short
# and fixed so the DuckDB oracle can inline the same list.
ENGLISH_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "it", "that", "this", "for", "on", "with", "as", "at", "by", "be",
]

# "BPE-ish" token pattern: word pieces, digit runs, single punctuation.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_label(col: Column | str) -> Column:
    """camelCase / snake_case / spaced label -> lowercase space-separated.

    ``someVeryGoodResource`` -> ``some very good resource``;
    ``huge_resource`` -> ``huge resource``.
    """
    c = _c(col)
    split_camel = F.regexp_replace(c, r"([a-z0-9])([A-Z])", r"$1 $2")
    unsnake = F.regexp_replace(split_camel, r"[_\-]+", " ")
    return F.lower(F.trim(F.regexp_replace(unsnake, r"\s+", " ")))


def _wstrip(col: Column) -> Column:
    """Strip ALL leading/trailing whitespace. ``F.trim`` strips only
    ASCII spaces (as does DuckDB's ``trim`` default), so a text ending
    in ``\\n`` would split into a phantom empty token — found by the
    property gate in tests/test_property_text.py."""
    return F.regexp_replace(col, r"^\s+|\s+$", "")


def tokenize(col: Column | str) -> Column:
    """Whitespace tokenizer over normalized text -> array<string>."""
    return F.split(_wstrip(_c(col)), r"\s+")


def token_count(col: Column | str) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    c = _wstrip(_c(col))
    return F.when(F.length(c) == 0, F.lit(0)).otherwise(F.size(F.split(c, r"\s+")))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Token count under the BPE-ish regex (letters / digits / punct)."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(BPE_ISH_PATTERN), 0))


def doc_fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.

    Identical in Spark and DuckDB, so dedup results are oracle-checkable.
    """
    c = _c(col)
    normalized = F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))
    return F.md5(normalized)


def quality_score(col: Column | str) -> Column:
    """Heuristic document-quality score in [0, 1].

    Combines length band, alphabetic ratio, and terminal punctuation —
    the classic cheap pre-filters of a training-data pipeline. Pure
    arithmetic so the oracle can reproduce it bit-for-bit.
    """
    c = _c(col)
    n = F.length(c)
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    alpha_ratio = F.when(n == 0, F.lit(0.0)).otherwise(alpha / n)
    len_score = F.least(F.lit(1.0), n / F.lit(200.0))
    ends_well = F.when(c.rlike(r"[.!?]\s*$"), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round(0.4 * alpha_ratio + 0.4 * len_score + 0.2 * ends_well, 6)


def english_stopword_ratio(col: Column | str) -> Column:
    """Fraction of whitespace tokens that are English stopwords.

    The n-gram-free language-ID heuristic: high ratio -> likely English.
    """
    toks = tokenize(F.lower(_c(col)))
    stop = F.array(*[F.lit(w) for w in ENGLISH_STOPWORDS])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        F.round(hits / F.size(toks), 6)
    )
