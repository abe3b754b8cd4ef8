"""Stage 1: batched mention detection over transcript text.

north_star: "batched mention detection and candidate entity generation
via vectorized pandas/Arrow UDFs". The stage tokenizes each turn and
emits candidate grams (unigrams + bigrams) with token positions — the
re-expression of the reference's per-label spaCy analysis
(reference src/compare_by_labels.py:58-123) for transcript turns.

Two interchangeable implementations (tested for identical output):

  native  pure JVM column expressions (split / transform / sequence),
          fully inside whole-stage codegen — the default. Tokenization
          this simple never needs to leave the JVM; per the engine's
          design rules the Python path is reserved for logic Spark
          cannot express.
  arrow   vectorized pandas UDF — the slot a real NER model plugs into
          (per-executor lazy init, Arrow batches, no per-row Python).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TOKEN = re.compile(r"[a-z0-9#\-]+")
# JVM twin of _TOKEN: split on the complement, drop empties
_TOKEN_SPLIT = r"[^a-z0-9#\-]+"

STOP_GRAMS = ("the", "a", "an", "in", "this", "of")

_GRAM_STRUCT = "struct<gram:string,start:int,end:int>"

_GRAMS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("gram", T.StringType()),
            T.StructField("start", T.IntegerType()),
            T.StructField("end", T.IntegerType()),
        ]
    )
)


def tokens(text_col) -> Column:
    """Lowercase token array, identical to ``_TOKEN.findall(text.lower())``."""
    return F.filter(
        F.split(F.lower(text_col), _TOKEN_SPLIT), lambda x: x != F.lit("")
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


def _grams_native() -> Column:
    """Unigram+bigram struct array from a ``_toks`` column, JVM-only.

    transform's index argument supplies positions; bigrams come from a
    0..n-2 sequence so the whole expression stays in codegen.
    """
    uni = F.transform(
        "_toks",
        lambda x, i: F.struct(
            x.alias("gram"),
            i.cast("int").alias("start"),
            i.cast("int").alias("end"),
        ),
    )
    bi = F.when(
        F.size("_toks") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("_toks") - 2),
            lambda i: F.struct(
                F.concat_ws(
                    " ",
                    F.element_at(F.col("_toks"), i + 1),
                    F.element_at(F.col("_toks"), i + 2),
                ).alias("gram"),
                i.cast("int").alias("start"),
                (i + 1).cast("int").alias("end"),
            ),
        ),
    ).otherwise(F.array().cast(f"array<{_GRAM_STRUCT}>"))
    return F.concat(uni, bi)


def detect_mentions(
    transcripts: DataFrame,
    impl: str = "native",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Explode each turn into candidate mention grams.

    Output: (conv_id, turn_idx, gram, start, end[, *keep_cols]).
    Stopword grams are filtered before the explode output ever shuffles;
    the dictionary join downstream prunes the rest. Narrow (no shuffle):
    scan -> project -> explode. ``keep_cols`` threads extra turn columns
    (e.g. ``ts`` on a stream) through the explode — callers must never
    re-join the output to its own input to recover them (on a stream
    that would be a stateful stream-stream join).
    """
    if impl == "arrow":
        exploded = transcripts.select(
            "conv_id",
            "turn_idx",
            *keep_cols,
            F.explode(_candidate_grams(F.col("text"))).alias("m"),
        )
    else:
        exploded = transcripts.withColumn("_toks", tokens(F.col("text"))).select(
            "conv_id",
            "turn_idx",
            *keep_cols,
            F.explode(_grams_native()).alias("m"),
        )
    g = exploded.select(
        "conv_id",
        "turn_idx",
        *keep_cols,
        F.col("m.gram").alias("gram"),
        F.col("m.start").alias("start"),
        F.col("m.end").alias("end"),
    )
    return g.filter(~F.col("gram").isin(*STOP_GRAMS))
