"""Corpus-vocabulary spellcheck via symmetric-delete blocking.

Re-expresses the reference's spellcheck normalization (N6,
``reference src/translate_onto.py:156-158`` — row-at-a-time
``spelchek.correct``) as a distributed edit-distance-1 correction
join, SymSpell-style:

  key set of a token = {token} ∪ {token with one char deleted}

Two tokens are within Damerau-free edit distance 1 (substitution,
insertion, deletion) ONLY IF their key sets intersect — substitution
at position i shares the delete-at-i variant, insertion/deletion share
the shorter string itself. So the candidate join is an EQUI-join on
exploded keys (bounded fan-out: len+1 keys per token), followed by an
exact ``levenshtein() <= 1`` verify — complete by construction, no
all-pairs comparison anywhere. This is the blocking that survives a
10^8-term vocabulary at 100 TB, where naive length- or prefix-blocking
either loses matches or degenerates.

Correction choice: highest corpus frequency, then lexicographic — a
deterministic total order shared with the DuckDB oracle (q56), whose
twin runs the NAIVE unblocked distance join as the independent
formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["delete1_keys", "spell_correct"]


def delete1_keys(col):
    """Array column: the token plus every single-character deletion."""
    return F.concat(
        F.array(col),
        F.filter(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length(col), F.lit(1))),
                lambda i: F.concat(
                    F.substring(col, F.lit(1), i - 1),
                    col.substr(i + 1, F.length(col)),
                ),
            ),
            lambda k: k != col,
        ),
    )


def spell_correct(
    probes: DataFrame,
    vocab: DataFrame,
    probe_col: str = "token",
    vocab_col: str = "term",
    freq_col: str = "freq",
) -> DataFrame:
    """For every distinct probe token, the best vocabulary term within
    edit distance 1 (freq desc, term asc), or no row if none exists.
    Returns ``(probe_col, corrected, distance, freq)``.

    Plan: explode delete-1 keys on both sides, equi-join on the key
    (the only shuffle, keyed by short strings), dedup candidate pairs,
    codegen ``levenshtein`` verify, single window for the best pick.
    """
    p = (
        probes.select(probe_col).distinct()
        .select(probe_col, F.explode(delete1_keys(F.col(probe_col))).alias("_k"))
    )
    v = vocab.select(
        F.col(vocab_col).alias("corrected"),
        F.col(freq_col).alias("freq"),
        F.explode(delete1_keys(F.col(vocab_col))).alias("_k"),
    )
    cand = (
        p.join(v, on="_k")
        .select(probe_col, "corrected", "freq")
        .distinct()
        .withColumn(
            "distance", F.levenshtein(F.col(probe_col), F.col("corrected"))
        )
        .filter(F.col("distance") <= 1)
    )
    w = Window.partitionBy(probe_col).orderBy(
        F.desc("freq"), F.asc("corrected")
    )
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
