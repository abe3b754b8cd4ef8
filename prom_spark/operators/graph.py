"""Distributed graph analytics over edge-list DataFrames.

Companions to operators/connected_components (the canonicalization
kernel): PageRank for node importance and degree-oriented triangle
counting for local clustering structure. Both take plain edge-list
DataFrames, so any upstream — KG triples, entity co-occurrence,
market-basket pairs, event-transition bigrams — feeds them directly.

Scale notes (the reason these shapes and not the textbook ones):

- ``pagerank`` keeps the rank vector as a DataFrame keyed by node and
  iterates join → groupBy; each iteration is one shuffle on the edge
  partitioning plus one on node. Lineage is cut with localCheckpoint
  every few iterations (the connected-components cadence) so the plan
  does not grow linearly with iteration count. Transition
  probabilities are precomputed ONCE (edge weight / weighted
  out-degree) so the loop body never re-aggregates degrees.
- ``triangle_counts`` uses the degree-orientation trick: orient every
  undirected edge from its (degree, id)-smaller endpoint to its larger
  one. Every triangle then has exactly ONE node with two outgoing
  oriented edges, so wedges (two out-edges at a node) joined against
  oriented edges enumerate each triangle exactly once, and the wedge
  count is bounded by sum(min(deg, sqrt(2m))^2) instead of
  sum(deg^2) — the standard defense against high-degree hubs that
  makes the plan survive power-law graphs at 100 TB.

Ranks are rounded to 12 decimals each iteration: the per-node
contribution sums are tiny (< 1e3 terms) so IEEE addition-order drift
is below 1e-15 relative, and pinning intermediates makes the whole
iteration bit-reproducible against the DuckDB oracle's chained-CTE
twin (q43) — same trick as the similarity kernels' round(x, 6).

No reference analogue; training-data-pipeline / KG-analytics extras.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cooccurrence_edges", "pagerank", "triangle_counts"]


def cooccurrence_edges(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_support: int = 2,
    max_items_per_group: int = 64,
) -> DataFrame:
    """Support-thresholded co-occurrence graph: an undirected edge
    ``(a, b)`` with ``a < b`` for every item pair sharing at least
    ``min_support`` groups (orders, documents, sessions, ...).

    The per-group pair generation is O(k²) in the group's distinct item
    count k — correct for bounded baskets but a single mega-group (a
    10⁶-item order in a 10¹²-row corpus) would otherwise emit 10¹²
    intermediate pairs inside ONE join task. ``max_items_per_group``
    caps k first, keeping the ``max_items_per_group`` smallest items
    per group (deterministic, via the skew-safe salted top-k, so the
    capping stage itself cannot be serialized by the hot group either).
    Groups at or under the cap — every real basket in the TPC-H-shaped
    testdata — are untouched; the truncation rule is part of the
    operator contract and mirrored in the q44 oracle twin, so a binding
    cap changes both engines identically.
    """
    if min_support < 1:
        raise ValueError(f"cooccurrence_edges: min_support must be >= 1")
    if max_items_per_group < 2:
        raise ValueError(
            f"cooccurrence_edges: max_items_per_group must be >= 2, "
            f"got {max_items_per_group}"
        )
    from prom_spark.operators.topk import salted_topk

    items = df.select(
        F.col(group_col).alias("_g"), F.col(item_col).alias("_i")
    ).distinct()
    capped = salted_topk(items, ["_g"], "_i", k=max_items_per_group)
    x, y = capped.alias("x"), capped.alias("y")
    return (
        x.join(
            y,
            on=(F.col("x._g") == F.col("y._g")) & (F.col("x._i") < F.col("y._i")),
        )
        .groupBy(F.col("x._i").alias("a"), F.col("y._i").alias("b"))
        .agg(F.count(F.lit(1)).alias("_support"))
        .filter(F.col("_support") >= min_support)
        .select("a", "b")
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 5,
    damping: float = 0.85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Weighted PageRank over a directed edge list; returns
    ``(node, rank)`` with ranks rounded to 12 decimals.

    Mass from dangling nodes (no out-edges) is dropped, not
    redistributed — the variant whose oracle twin is a pure chain of
    joins; ranks then sum to <= 1. ``weight=None`` treats every edge
    as weight 1. Duplicate (src, dst) rows act as summed weights.
    """
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.groupBy(src, dst).agg(F.sum(w).alias("_w"))
    out_w = e.groupBy(src).agg(F.sum("_w").alias("_out_w"))
    # transition probability per edge, fixed across iterations
    trans = (
        e.join(out_w, on=src)
        .select(
            F.col(src).alias("_src"),
            F.col(dst).alias("_dst"),
            (F.col("_w") / F.col("_out_w")).alias("_p"),
        )
        .localCheckpoint(eager=False)
    )
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for i in range(iterations):
        contrib = (
            trans.join(ranks, trans["_src"] == ranks["node"])
            .groupBy(F.col("_dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("_p")).alias("_c"))
        )
        ranks = nodes.join(contrib, on="node", how="left").select(
            "node",
            F.round(
                F.lit(base) + F.lit(damping) * F.coalesce("_c", F.lit(0.0)),
                12,
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def triangle_counts(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Per-node triangle participation over an UNDIRECTED graph given
    as an edge list (direction and duplicates ignored, self-loops
    dropped). Returns ``(node, degree, triangles, clustering)`` for
    every node with degree >= 1; ``clustering`` is the local
    clustering coefficient 2T/(d(d-1)) rounded to 6, 0.0 for degree-1
    nodes.
    """
    # canonical undirected edge set: lo < hi, distinct
    canon = (
        edges.select(
            F.least(F.col(a), F.col(b)).alias("lo"),
            F.greatest(F.col(a), F.col(b)).alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        canon.select(F.col("lo").alias("node"))
        .unionByName(canon.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    # orient lo->hi iff (deg, id) of lo < (deg, id) of hi; ties cannot
    # happen (node ids are distinct and break degree ties)
    dl = deg.select(F.col("node").alias("lo"), F.col("degree").alias("_dl"))
    dh = deg.select(F.col("node").alias("hi"), F.col("degree").alias("_dh"))
    oriented = (
        canon.join(dl, on="lo")
        .join(dh, on="hi")
        .select(
            F.when(
                (F.col("_dl") < F.col("_dh"))
                | ((F.col("_dl") == F.col("_dh")) & (F.col("lo") < F.col("hi"))),
                F.struct(F.col("lo").alias("u"), F.col("hi").alias("v")),
            )
            .otherwise(F.struct(F.col("hi").alias("u"), F.col("lo").alias("v")))
            .alias("e")
        )
        .select(F.col("e.u").alias("u"), F.col("e.v").alias("v"))
        .localCheckpoint(eager=False)
    )
    # wedges at the orientation-minimal node of each candidate triangle
    e1 = oriented.select(F.col("u"), F.col("v").alias("x"))
    e2 = oriented.select(F.col("u"), F.col("v").alias("y"))
    wedges = e1.join(e2, on="u").filter(F.col("x") < F.col("y"))
    # close the wedge against the undirected edge set (the wedge pair is
    # id-ordered x < y, matching canon's lo < hi)
    closing = canon.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
    tris = wedges.join(closing, on=["x", "y"], how="left_semi")
    per_node = (
        tris.select(F.col("u").alias("node"))
        .unionByName(tris.select(F.col("x").alias("node")))
        .unionByName(tris.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return deg.join(per_node, on="node", how="left").select(
        "node",
        "degree",
        F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
        F.when(F.col("degree") < 2, F.lit(0.0))
        .otherwise(
            F.round(
                2.0
                * F.coalesce("triangles", F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1.0)),
                6,
            )
        )
        .alias("clustering"),
    )
