"""Stage 1: batched mention detection over transcript text.

north_star: "batched mention detection and candidate entity generation
via vectorized pandas/Arrow UDFs". The UDF tokenizes each turn and emits
candidate grams (unigrams + bigrams) with token positions — the
re-expression of the reference's per-label spaCy analysis
(reference src/compare_by_labels.py:58-123) for transcript turns.
Model-free and deterministic; a real NER model would slot into the same
UDF shape (per-executor lazy init, Arrow batches).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TOKEN = re.compile(r"[a-z0-9#\-]+")

_GRAMS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("gram", T.StringType()),
            T.StructField("start", T.IntegerType()),
            T.StructField("end", T.IntegerType()),
        ]
    )
)


@F.pandas_udf(_GRAMS_TYPE)
def _candidate_grams(texts: pd.Series) -> pd.Series:
    out = []
    for text in texts:
        toks = _TOKEN.findall((text or "").lower())
        grams = [(t, i, i) for i, t in enumerate(toks)]
        grams += [
            (f"{toks[i]} {toks[i+1]}", i, i + 1) for i in range(len(toks) - 1)
        ]
        out.append(grams)
    return pd.Series(out)


def detect_mentions(transcripts: DataFrame) -> DataFrame:
    """Explode each turn into candidate mention grams.

    Output: (conv_id, turn_idx, gram, start, end). Stopword-ish grams are
    pre-filtered JVM-side to cut the join input (predicate pushdown does
    the rest once the dictionary join prunes non-entities).
    """
    g = transcripts.select(
        "conv_id",
        "turn_idx",
        F.explode(_candidate_grams(F.col("text"))).alias("m"),
    ).select(
        "conv_id",
        "turn_idx",
        F.col("m.gram").alias("gram"),
        F.col("m.start").alias("start"),
        F.col("m.end").alias("end"),
    )
    return g.filter(~F.col("gram").isin("the", "a", "an", "in", "this", "of"))
