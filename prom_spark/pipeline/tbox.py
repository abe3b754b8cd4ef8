"""TBox alignment pipeline: lexical -> structural -> selection.

Re-expression of the reference's merge flow (reference src/prom.py:86-111
``match_tbox``): structural scoring in "semi" mode over the lexical
matches, then relation-class partitioning — disjoint matches bypass
selection, inverse matches get their own 1:1 selection, everything else
(equivalence/hypernym/hyponym) a third — both selections at the reject
threshold (strict >).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prom_spark.config import DEFAULT_CONFIG, PipelineConfig
from prom_spark.matchers.analysis import analyze_labels
from prom_spark.matchers.lexical import lexical_match
from prom_spark.matchers.structural import structural_match
from prom_spark.operators.selection import greedy_one_to_one


@dataclass(frozen=True)
class OntologyTables:
    """One side's ontology as DataFrames (labels + axiom scans S2-S5)."""

    labels: DataFrame
    class_axioms: DataFrame
    op_axioms: DataFrame
    dp_axioms: DataFrame


def align_tbox(
    onto1: OntologyTables,
    onto2: OntologyTables,
    alias_df: DataFrame,
    vocab_df: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Full TBox alignment; returns accepted matches
    (elem_type, iri1, iri2, relation, rating)."""
    # F4: blank-node classes never take part in matching
    # (reference src/translate_onto.py:188)
    an1 = analyze_labels(drop_bnodes(onto1.labels))
    an2 = analyze_labels(drop_bnodes(onto2.labels))

    semantic = lexical_match(an1, an2, alias_df, vocab_df, cfg)
    semantic = semantic.localCheckpoint(eager=False)

    rated = structural_match(
        semantic,
        onto1.class_axioms, onto2.class_axioms,
        onto1.op_axioms, onto2.op_axioms,
        onto1.dp_axioms, onto2.dp_axioms,
        cfg,
    )
    rated = rated.localCheckpoint(eager=False)

    disj = rated.filter(F.col("relation") == "disjoint").filter(
        F.col("rating") > cfg.reject_threshold
    )
    inv = greedy_one_to_one(
        rated.filter(F.col("relation") == "inverse"),
        threshold=cfg.reject_threshold,
    )
    other = greedy_one_to_one(
        rated.filter(~F.col("relation").isin("disjoint", "inverse")),
        threshold=cfg.reject_threshold,
    )
    return other.unionByName(inv).unionByName(disj)


def drop_bnodes(labels: DataFrame) -> DataFrame:
    """F4: remove blank-node elements (reference src/translate_onto.py:188)."""
    return labels.filter(~F.col("iri").startswith("_:"))


def confidence_bands(
    matches: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """F7: split matches into (auto-accepted, human-review, rejected).

    The reference routes the middle band through an interactive CLI
    (reference src/cli_confirm.py:10-23); at corpus scale the band is
    materialized as a table for offline review instead — thresholds
    ``cfg.accept_threshold`` / ``cfg.reject_threshold`` mirror
    config.yml:14-15.
    """
    accepted = matches.filter(F.col("rating") >= cfg.accept_threshold)
    review = matches.filter(
        (F.col("rating") >= cfg.reject_threshold)
        & (F.col("rating") < cfg.accept_threshold)
    )
    rejected = matches.filter(F.col("rating") < cfg.reject_threshold)
    return accepted, review, rejected
