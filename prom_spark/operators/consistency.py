"""Alignment consistency validation (G2 replacement).

The reference loops: build link ontology -> run an OWL reasoner -> ask
the user to repair inconsistencies (reference src/prom.py:138-168,
src/onto_debugger.py:88-124). A DL reasoner is out of scope at corpus
scale, but the inconsistency class the merge pipeline actually produces
is detectable as a join: a `disjoint` correspondence whose two sides
land in the SAME equivalence cluster contradicts the cluster merge.

``find_conflicts`` returns exactly those disjoint edges;
``drop_conflicting_equivalences`` is the automated repair the
reference's interactive loop converges to (prefer the explicit disjoint
assertion, drop the weakest equivalence edges inside the offending
cluster — deterministic, no CLI).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prom_spark.operators.connected_components import connected_components


def _clusters(equivalences: DataFrame) -> DataFrame:
    """(node, component) from accepted equivalence matches."""
    edges = equivalences.select(
        F.col("iri1").alias("src"), F.col("iri2").alias("dst")
    )
    return connected_components(edges, "src", "dst")


def find_conflicts(
    equivalences: DataFrame, disjoints: DataFrame
) -> DataFrame:
    """Disjoint matches whose endpoints share an equivalence cluster.

    One CC pass + two broadcast-able joins; returns the offending
    disjoint rows with the shared ``component``.
    """
    cc = _clusters(equivalences)
    c1 = cc.select(F.col("node").alias("iri1"), F.col("component").alias("_c1"))
    c2 = cc.select(F.col("node").alias("iri2"), F.col("component").alias("_c2"))
    return (
        disjoints.join(c1, on="iri1")
        .join(c2, on="iri2")
        .filter(F.col("_c1") == F.col("_c2"))
        .withColumn("component", F.col("_c1"))
        .drop("_c1", "_c2")
    )


def drop_conflicting_equivalences(
    equivalences: DataFrame, disjoints: DataFrame, max_rounds: int | None = None
) -> DataFrame:
    """Repair to a FIXPOINT: returns equivalences with no remaining
    conflict against ``disjoints``.

    Each round removes, inside every conflicted cluster, the equivalence
    edges weaker than the strongest disjoint assertion there; when no
    edge is that weak (two strong edges bridging the disjoint endpoints
    through a middle node), the round instead removes the cluster's
    single weakest edge — so every round removes at least one edge per
    conflicted cluster and the loop TERMINATES unconditionally (the edge
    set strictly shrinks; worst case |E| rounds). ``max_rounds`` is an
    optional safety cap only — hitting it warns loudly instead of
    silently returning still-conflicting equivalences, since downstream
    consumers assume the output is clean. Deterministic automated
    stand-in for the reference's interactive debug loop.
    """
    import itertools
    import warnings

    from pyspark.sql import Window

    e = equivalences
    rounds = range(max_rounds) if max_rounds is not None else itertools.count()
    clean = False
    for _ in rounds:
        conflicts = find_conflicts(e, disjoints)
        if conflicts.isEmpty():
            clean = True
            break
        bad = conflicts.groupBy("component").agg(
            F.max("rating").alias("_disj_rating")
        )
        cc = _clusters(e)
        w_cluster = Window.partitionBy("component")
        w_rank = Window.partitionBy("component").orderBy(
            F.col("rating").asc(), F.col("iri1"), F.col("iri2")
        )
        tagged = (
            e.join(
                cc.select(F.col("node").alias("iri1"), F.col("component")),
                on="iri1",
                how="left",
            )
            .join(F.broadcast(bad), on="component", how="left")
            .withColumn(
                "_below",
                F.max((F.col("rating") <= F.col("_disj_rating")).cast("int")).over(
                    w_cluster
                ),
            )
            .withColumn("_rk", F.row_number().over(w_rank))
        )
        e = (
            tagged.filter(
                F.col("_disj_rating").isNull()
                | (
                    (F.col("rating") > F.col("_disj_rating"))
                    & ~((F.col("_below") == 0) & (F.col("_rk") == 1))
                )
            )
            .drop("component", "_disj_rating", "_below", "_rk")
            .localCheckpoint(eager=True)
        )
    if not clean and max_rounds is not None and find_conflicts(e, disjoints).isEmpty():
        clean = True
    if not clean:
        warnings.warn(
            f"drop_conflicting_equivalences hit max_rounds={max_rounds} with "
            "conflicts remaining — output is NOT conflict-free",
            RuntimeWarning,
            stacklevel=2,
        )
    return e
