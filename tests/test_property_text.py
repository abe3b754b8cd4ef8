"""Property-based gates for the text-analysis expressions.

`functions/text.py` promises pure JVM expressions a DuckDB oracle can
reproduce bit-for-bit (q16/q17 run that gate on fixed data). These tests
add randomized inputs against independent pure-Python oracles, so a
regex or arithmetic rewrite that survives the fixed fixtures still gets
caught. Batched: one Spark job per hypothesis example.
"""

from __future__ import annotations

import hashlib
import math
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from prom_spark.functions.text import (
    BPE_ISH_PATTERN,
    ENGLISH_STOPWORDS,
    bpe_ish_token_count,
    doc_fingerprint,
    english_stopword_ratio,
    normalize_label,
    quality_score,
    token_count,
)

# text that exercises every regex branch: camelCase boundaries, digits,
# punctuation, runs of whitespace, underscores/dashes, stopwords
_TEXT = st.text(
    alphabet="abcXY09 _-.!?\t\n" + "the and of ",
    min_size=0,
    max_size=60,
)

_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_normalize(s: str) -> str:
    s = re.sub(r"([a-z0-9])([A-Z])", r"\1 \2", s)
    s = re.sub(r"[_\-]+", " ", s)
    return re.sub(r"\s+", " ", s).strip().lower()


def _py_token_count(s: str) -> int:
    t = s.strip()
    return 0 if not t else len(re.split(r"\s+", t))


def _py_bpe_count(s: str) -> int:
    return len(re.findall(BPE_ISH_PATTERN, s))


def _py_fingerprint(s: str) -> str:
    norm = re.sub(r"\s+", " ", s).strip().lower()
    return hashlib.md5(norm.encode("utf-8")).hexdigest()


def _py_quality(s: str) -> float:
    n = len(s)
    alpha = len(re.sub(r"[^A-Za-z]", "", s))
    alpha_ratio = 0.0 if n == 0 else alpha / n
    len_score = min(1.0, n / 200.0)
    ends_well = 1.0 if re.search(r"[.!?]\s*$", s) else 0.0
    return round(0.4 * alpha_ratio + 0.4 * len_score + 0.2 * ends_well, 6)


def _py_stopword_ratio(s: str) -> float:
    t = s.lower().strip()
    toks = re.split(r"\s+", t) if t else []
    # mirror tokenize(): split of "" yields [""]; ratio guard is on size
    if not toks:
        return 0.0
    hits = sum(1 for w in toks if w in ENGLISH_STOPWORDS)
    return round(hits / len(toks), 6)


def _run(spark, texts, col_expr):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [r.v for r in df.select(col_expr("text").alias("v")).collect()]


@_SETTINGS
@given(st.lists(_TEXT, min_size=1, max_size=40))
def test_normalize_label_matches_python(spark, texts):
    got = _run(spark, texts, normalize_label)
    for t, g in zip(texts, got):
        assert g == _py_normalize(t), repr(t)


@_SETTINGS
@given(st.lists(_TEXT, min_size=1, max_size=40))
def test_token_counts_match_python(spark, texts):
    got_ws = _run(spark, texts, token_count)
    got_bpe = _run(spark, texts, bpe_ish_token_count)
    for t, gw, gb in zip(texts, got_ws, got_bpe):
        assert gw == _py_token_count(t), repr(t)
        assert gb == _py_bpe_count(t), repr(t)


@_SETTINGS
@given(st.lists(_TEXT, min_size=1, max_size=40))
def test_fingerprint_quality_stopwords_match_python(spark, texts):
    got_fp = _run(spark, texts, doc_fingerprint)
    got_q = _run(spark, texts, quality_score)
    got_sw = _run(spark, texts, english_stopword_ratio)
    for t, gf, gq, gs in zip(texts, got_fp, got_q, got_sw):
        assert gf == _py_fingerprint(t), repr(t)
        assert math.isclose(gq, _py_quality(t), abs_tol=1e-9), repr(t)
        assert math.isclose(gs, _py_stopword_ratio(t), abs_tol=1e-9), repr(t)
