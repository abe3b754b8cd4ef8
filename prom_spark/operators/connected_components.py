"""Iterative connected components over an edge DataFrame.

Canonicalization (G1): the reference's link ontology inserts equivalence
edges between matched entities (reference src/create_link_onto.py:24-51);
the transitive closure of those edges forms merged concept clusters. At
transcript scale this is the alternating large-star / small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SOCC'14) — every iteration is two self-joins + aggregations,
converging in O(log^2 n) rounds; each round re-expressed as DataFrame
groupBy/join so Catalyst handles partial aggregation map-side.

Output: (node, component) with component = min node id of the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge list as (u, v) string pairs, self-loops dropped."""
    return (
        edges.select(F.col(src).cast("string").alias("u"), F.col(dst).cast("string").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every neighbor larger than the node to the neighborhood min."""
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    with_min = sym.groupBy("u").agg(F.collect_set("v").alias("nbrs"))
    with_min = with_min.withColumn(
        "m", F.least(F.col("u"), F.array_min("nbrs"))
    )
    out = with_min.select(
        F.explode("nbrs").alias("x"), F.col("u"), F.col("m")
    ).filter(F.col("x") > F.col("u")).select(F.col("x").alias("u"), F.col("m").alias("v"))
    return out.filter(F.col("u") != F.col("v")).distinct()


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges to smaller endpoint; connect neighbors <= node to min."""
    oriented = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    grouped = oriented.groupBy("u").agg(F.collect_set("v").alias("nbrs"))
    grouped = grouped.withColumn("m", F.least(F.col("u"), F.array_min("nbrs")))
    out = grouped.select(
        F.explode(F.array_union("nbrs", F.array("u"))).alias("x"), F.col("m")
    ).select(F.col("x").alias("u"), F.col("m").alias("v"))
    return out.filter(F.col("u") != F.col("v")).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """Compute connected components; returns (node, component).

    Convergence check compares the large-star edge multiset hash between
    rounds (sum of per-edge hashes — order-insensitive, computed
    distributed). ``localCheckpoint`` each round truncates lineage so the
    plan does not grow exponentially — the scale-critical detail.
    """
    e = _canonical_edges(edges, src, dst).localCheckpoint(eager=True)
    nodes = e.select(F.col("u").alias("node")).unionByName(
        e.select(F.col("v").alias("node"))
    ).distinct()

    prev_sig = None
    for _ in range(max_iterations):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        sig_row = e.select(
            F.count("*").alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
        ).collect()[0]
        sig = (sig_row.n, sig_row.h)
        if sig == prev_sig:
            break
        prev_sig = sig

    # after convergence every edge points node -> component min
    comp = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    return (
        nodes.join(comp, on="node", how="left")
        .withColumn("component", F.coalesce("component", "node"))
    )
