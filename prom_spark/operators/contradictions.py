"""Contradiction pruning over a match vector.

Re-expression of the reference's ``reduce_vector``
(reference src/compare_by_labels.py:346-375), which pairwise-scans the
match list and drops every match that is *dominated* by another match
under one of three rules. A match survives iff no rule pairs it with a
stronger match, so the O(n^2) pairwise scan becomes a handful of window
functions:

rule 1 — same (elem_type, iri1, iri2): keep only max rating; among ties
         at the max, hyponym/hypernym lose to equivalence.
rule 2 — same iri1 (or same iri2), both equivalence: per side keep only
         the max rating; a row must win on BOTH of its sides.
rule 3 — same iri1 with relations {equivalence, hyponym} (dually: same
         iri2 with {equivalence, hypernym}): dominated hyponym/hypernym
         rows are dropped.

Ties are broken by the deterministic total order (rating desc,
relation-priority, iri1, iri2); the reference's tie behavior is
list-order-dependent (it keeps whichever came first), which we replace
with a stable canonical order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def _rel_priority():
    """Equivalence preferred on exact-duplicate ties (rule 1). Built
    lazily: constructing a Column requires an active session, and this
    module must be importable before one exists (e.g. on executors)."""
    return F.when(F.col("relation") == "equivalence", 0).otherwise(1)


def reduce_vector(matches: DataFrame) -> DataFrame:
    """Drop contradictory/dominated matches; see module docstring.

    Input schema: (elem_type, iri1, iri2, relation, rating, ...).
    """
    df = matches

    # --- rule 1: exact duplicate notion pairs ---------------------------
    w_pair = Window.partitionBy("elem_type", "iri1", "iri2")
    df = (
        df.withColumn("_pair_max", F.max("rating").over(w_pair))
        .filter(F.col("rating") == F.col("_pair_max"))
        .withColumn(
            "_pair_has_eq",
            F.max((F.col("relation") == "equivalence").cast("int")).over(w_pair),
        )
        .filter(
            ~(
                (F.col("_pair_has_eq") == 1)
                & F.col("relation").isin("hyponym", "hypernym")
            )
        )
        .drop("_pair_max", "_pair_has_eq")
    )

    # --- rule 2: 1-side duplicates among equivalence matches -----------
    is_eq = F.col("relation") == "equivalence"
    order = [F.col("rating").desc(), F.col("iri1"), F.col("iri2")]
    # rank only among equivalence rows, independently per side; a row
    # survives iff it wins its iri1 group AND its iri2 group.
    eq_rows = df.filter(is_eq)
    other_rows = df.filter(~is_eq)
    w1 = Window.partitionBy("elem_type", "iri1").orderBy(*order)
    w2 = Window.partitionBy("elem_type", "iri2").orderBy(*order)
    eq_rows = (
        eq_rows.withColumn("_rk1", F.row_number().over(w1))
        .withColumn("_rk2", F.row_number().over(w2))
        .filter((F.col("_rk1") == 1) & (F.col("_rk2") == 1))
        .drop("_rk1", "_rk2")
    )
    df = eq_rows.unionByName(other_rows)

    # --- rule 3: subsumption dominated by equivalence-or-better --------
    # a hyponym row loses to any same-iri1 row in {equivalence, hyponym}
    # with strictly higher rating (ties: equivalence wins, then order);
    # dually hypernym on iri2.
    in1 = F.col("relation").isin("equivalence", "hyponym")
    in2 = F.col("relation").isin("equivalence", "hypernym")
    df = (
        df.withColumn(
            "_rk_sub1",
            F.row_number().over(
                Window.partitionBy(
                    "elem_type", "iri1", F.when(in1, 1).otherwise(2)
                ).orderBy(F.col("rating").desc(), _rel_priority(), F.col("iri2"))
            ),
        )
        .withColumn(
            "_rk_sub2",
            F.row_number().over(
                Window.partitionBy(
                    "elem_type", "iri2", F.when(in2, 1).otherwise(2)
                ).orderBy(F.col("rating").desc(), _rel_priority(), F.col("iri1"))
            ),
        )
        .filter(
            ~((F.col("relation") == "hyponym") & in1 & (F.col("_rk_sub1") > 1))
        )
        .filter(
            ~((F.col("relation") == "hypernym") & in2 & (F.col("_rk_sub2") > 1))
        )
        .drop("_rk_sub1", "_rk_sub2")
    )
    return df
