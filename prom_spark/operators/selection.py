"""Distributed 1:1 alignment selection.

Re-expression of the reference's greedy alignment selector
(reference src/alignment_selector.py:153-169: sort matches by rating
descending, accept a match iff neither side is already taken).

A global sequential sort does not distribute, but greedy matching under a
*total* order on edges equals the "locally dominant edge" parallel
algorithm (Preis-style): an edge is accepted iff it is the best remaining
edge for BOTH of its endpoints. Iterating (accept locally dominant ->
remove conflicting) converges in O(log n) rounds and yields exactly the
sequential-greedy matching for the same total order.

The reference itself is non-deterministic on rating ties
(src/alignment_selector.py:160-162); we fix the total order to
(rating desc, uid1 asc, uid2 asc) so results are reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def enforce_threshold(matches: DataFrame, threshold: float, rating_col: str = "rating") -> DataFrame:
    """Strictly-greater threshold filter (reference src/alignment_selector.py:49-55)."""
    return matches.filter(F.col(rating_col) > F.lit(threshold))


def greedy_one_to_one(
    matches: DataFrame,
    uid1_col: str = "iri1",
    uid2_col: str = "iri2",
    rating_col: str = "rating",
    threshold: float | None = None,
    max_rounds: int = 50,
) -> DataFrame:
    """Greedy maximal 1:1 matching, distributed.

    Each round: rank candidate edges within both endpoint partitions by
    the total order (rating desc, uid1, uid2); accept edges ranked 1 on
    both sides; anti-join out every edge that conflicts with an accepted
    one; repeat until no candidates remain.

    Scale: each round is two window functions + two broadcast-able
    anti-joins on the shrinking candidate set. Accepted edges per round
    are at most one per endpoint, and the candidate set shrinks
    geometrically in practice. ``remaining`` is materialized via
    ``localCheckpoint`` every round by default: a lazy ``remaining``
    replays every earlier round's windows from the last checkpoint, so
    round k costs k window layers instead of one — measured 3x on the
    iterative-selection benchmark entry even at tiny inputs.
    """
    if threshold is not None:
        matches = enforce_threshold(matches, threshold, rating_col)

    cols = matches.columns
    remaining = matches
    accepted: DataFrame | None = None

    w1 = Window.partitionBy(uid1_col).orderBy(
        F.col(rating_col).desc(), F.col(uid1_col), F.col(uid2_col)
    )
    w2 = Window.partitionBy(uid2_col).orderBy(
        F.col(rating_col).desc(), F.col(uid1_col), F.col(uid2_col)
    )

    # per-round cost: ONE materialization (localCheckpoint of the shrunk
    # remaining, which computes the round's two windows exactly once) +
    # ONE isEmpty probe. Winners stay lazy — each winner plan is a single
    # window layer over its round's CHECKPOINTED parent, so the final
    # union materializes in one cheap pass with no cross-round replay.
    # When remaining is non-empty the top edge under the total order is
    # rank 1 on both sides, so every round accepts >= 1 edge and the
    # loop terminates.
    remaining = remaining.localCheckpoint(eager=True)
    if remaining.isEmpty():
        return matches.limit(0)
    for _ in range(max_rounds):
        ranked = remaining.withColumn("_r1", F.row_number().over(w1)).withColumn(
            "_r2", F.row_number().over(w2)
        )
        winners = ranked.filter((F.col("_r1") == 1) & (F.col("_r2") == 1)).select(*cols)
        accepted = winners if accepted is None else accepted.unionByName(winners)
        remaining = (
            ranked.filter((F.col("_r1") > 1) | (F.col("_r2") > 1))
            .select(*cols)
            .join(F.broadcast(winners.select(uid1_col)), on=uid1_col, how="left_anti")
            .join(F.broadcast(winners.select(uid2_col)), on=uid2_col, how="left_anti")
        ).localCheckpoint(eager=True)
        if remaining.isEmpty():
            break

    return accepted.select(*cols)


def optimal_one_to_one(
    matches: DataFrame,
    uid1_col: str = "iri1",
    uid2_col: str = "iri2",
    rating_col: str = "rating",
    threshold: float | None = None,
    max_block_edges: int = 32,
) -> DataFrame:
    """Exact maximum-weight 1:1 matching, distributed per candidate block.

    Re-expression of the reference's exhaustive "optimal" selector
    (reference src/alignment_selector.py:75-131): maximize the summed
    rating under the 1:1 constraint. The global problem decomposes over
    connected components of the bipartite candidate graph — edges in
    different blocks can never conflict — so each block is solved
    EXACTLY with branch-and-bound inside ``applyInPandas`` (Arrow
    batches; the candidate blocks are the only place the engine runs
    Python, and each block is small by construction once thresholding
    and blocking have pruned the graph).

    Blocks larger than ``max_block_edges`` fall back to sequential
    greedy under the total order (rating desc, uid1, uid2) — the same
    cap-vs-exactness tradeoff the reference faces (its exhaustive
    selector is exponential too; config default is greedy).
    """
    import pandas as pd

    from prom_spark.operators.connected_components import connected_components

    if threshold is not None:
        matches = enforce_threshold(matches, threshold, rating_col)

    cols = matches.columns
    edges = matches.select(
        F.concat(F.lit("L:"), F.col(uid1_col)).alias("src"),
        F.concat(F.lit("R:"), F.col(uid2_col)).alias("dst"),
    )
    cc = connected_components(edges, "src", "dst")
    blocks = cc.filter(F.col("node").startswith("L:")).select(
        F.expr("substring(node, 3)").alias(uid1_col),
        F.col("component").alias("_block"),
    )
    with_block = matches.join(blocks, on=uid1_col)

    def _solve(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(
            pdf.to_dict("records"),
            key=lambda r: (-r[rating_col], r[uid1_col], r[uid2_col]),
        )
        if len(rows) > max_block_edges:
            taken1, taken2, keep = set(), set(), []
            for r in rows:
                if r[uid1_col] not in taken1 and r[uid2_col] not in taken2:
                    taken1.add(r[uid1_col])
                    taken2.add(r[uid2_col])
                    keep.append(r)
            return pd.DataFrame(keep, columns=pdf.columns)[list(cols) + ["_block"]]

        # upper bound must never underestimate: negative-rated edges can
        # only lower the sum, so they contribute 0 to the remaining-gain
        # bound (a plain suffix sum would prune the true optimum when
        # ratings go negative)
        suffix = [0.0] * (len(rows) + 1)
        for i in range(len(rows) - 1, -1, -1):
            suffix[i] = suffix[i + 1] + max(rows[i][rating_col], 0.0)
        best_sum = -1.0
        best: list[int] = []

        def dfs(i, used1, used2, cur_sum, chosen):
            nonlocal best_sum, best
            if cur_sum + suffix[i] <= best_sum:
                return
            if i == len(rows):
                if cur_sum > best_sum:
                    best_sum, best = cur_sum, list(chosen)
                return
            r = rows[i]
            if r[uid1_col] not in used1 and r[uid2_col] not in used2:
                used1.add(r[uid1_col]); used2.add(r[uid2_col])
                chosen.append(i)
                dfs(i + 1, used1, used2, cur_sum + r[rating_col], chosen)
                chosen.pop()
                used1.discard(r[uid1_col]); used2.discard(r[uid2_col])
            dfs(i + 1, used1, used2, cur_sum, chosen)

        dfs(0, set(), set(), 0.0, [])
        keep = [rows[i] for i in best]
        return pd.DataFrame(keep, columns=pdf.columns)[list(cols) + ["_block"]]

    return (
        with_block.groupBy("_block")
        .applyInPandas(_solve, schema=with_block.select(*cols, "_block").schema)
        .select(*cols)
    )


def best_candidate_per_left_agg(
    matches: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    rating_col: str = "rating",
    threshold: float | None = None,
) -> DataFrame:
    """Top-1 candidate per left key via a single aggregation.

    Semantically identical to ``best_candidate_per_left`` for numeric
    ratings (max rating, ties broken by ascending payload order), but
    implemented as ``min(struct(-rating, payload...))`` instead of a
    ``row_number`` window: one shuffle with map-side partial aggregation,
    so Zipf-hot keys collapse before the exchange — the scale-correct
    plan for entity linking where the window's full sort buys nothing.
    """
    if threshold is not None:
        matches = matches.filter(F.col(rating_col) > F.lit(threshold))
    best = matches.groupBy(*key_cols).agg(
        F.min(
            F.struct(
                (-F.col(rating_col)).alias("_nr"),
                *[F.col(c) for c in payload_cols],
            )
        ).alias("_b")
    )
    return best.select(
        *key_cols,
        *[F.col(f"_b.{c}").alias(c) for c in payload_cols],
        (-F.col("_b._nr")).alias(rating_col),
    )


def best_candidate_per_left(
    matches: DataFrame,
    uid1_col: str | list[str] = "mention_id",
    uid2_col: str = "entity_id",
    rating_col: str = "rating",
    threshold: float | None = None,
    extra_order: list | None = None,
) -> DataFrame:
    """Top-1 candidate per left key (entity-linking selection).

    Unlike ontology alignment, entity linking is many-to-one: many
    mentions may resolve to the same entity, so only the left side is
    constrained. Single window pass, no iteration. ``uid1_col`` may be a
    composite key (list of columns); ``extra_order`` columns are ranked
    before the rating (e.g. longest-gram-first).
    """
    if threshold is not None:
        matches = matches.filter(F.col(rating_col) > F.lit(threshold))
    left_cols = uid1_col if isinstance(uid1_col, list) else [uid1_col]
    order = list(extra_order or []) + [F.col(rating_col).desc(), F.col(uid2_col)]
    w = Window.partitionBy(*left_cols).orderBy(*order)
    return (
        matches.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
