"""Alignment quality assessment vs a golden reference.

Re-expression of reference src/quality_assessment.py:27-55:
P = |A ∩ R| / |A|, R = |A ∩ R| / |R|, F = 2PR/(P+R). Intersection is an
inner join on the 3-tuple (iri1, iri2, relation); complements via
left-anti joins (faulty = A \\ R, missed = R \\ A).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

KEY = ["iri1", "iri2", "relation"]


@dataclass(frozen=True)
class QualityReport:
    precision: float
    recall: float
    fmeasure: float
    n_alignment: int
    n_reference: int
    n_correct: int


def assess(alignment: DataFrame, reference: DataFrame) -> QualityReport:
    a = alignment.select(*KEY).distinct()
    r = reference.select(*KEY).distinct()
    n_a = a.count()
    n_r = r.count()
    n_c = a.join(r, on=KEY, how="inner").count()
    precision = n_c / n_a if n_a else 0.0
    recall = n_c / n_r if n_r else 0.0
    f = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return QualityReport(precision, recall, f, n_a, n_r, n_c)


def faulty_matches(alignment: DataFrame, reference: DataFrame) -> DataFrame:
    return alignment.select(*KEY).distinct().join(
        reference.select(*KEY), on=KEY, how="left_anti"
    )


def missed_matches(alignment: DataFrame, reference: DataFrame) -> DataFrame:
    return reference.select(*KEY).distinct().join(
        alignment.select(*KEY), on=KEY, how="left_anti"
    )
