"""pagerank / triangle_counts vs hand-computed oracles on tiny graphs."""

import pytest
from pyspark.sql import functions as F

from prom_spark.operators.graph import pagerank, triangle_counts


def _py_pagerank(edges, iterations=5, damping=0.85):
    """Sequential reference: same variant (dangling mass dropped),
    same round-12 intermediate pinning."""
    from collections import defaultdict

    w = defaultdict(float)
    for s, d_, ww in edges:
        w[(s, d_)] += ww
    out = defaultdict(float)
    for (s, _), ww in w.items():
        out[s] += ww
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        contrib = defaultdict(float)
        for (s, d_), ww in sorted(w.items()):
            contrib[d_] += rank[s] * (ww / out[s])
        rank = {
            v: round((1.0 - damping) / n + damping * contrib.get(v, 0.0), 12)
            for v in nodes
        }
    return rank


EDGES = [
    ("a", "b", 2.0), ("a", "c", 1.0), ("b", "c", 1.0),
    ("c", "a", 1.0), ("d", "c", 3.0), ("b", "a", 1.0),
    # duplicate row: must act as summed weight
    ("a", "b", 1.0),
]


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "src string, dst string, w double")


def test_pagerank_matches_sequential_oracle(spark, edges_df):
    got = {r.node: r.rank for r in pagerank(edges_df, weight="w").collect()}
    want = _py_pagerank(EDGES)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_pagerank_dangling_node_keeps_base_rank(spark, edges_df):
    # 'd' has no in-edges: rank must settle at the teleport base
    got = {r.node: r.rank for r in pagerank(edges_df, weight="w").collect()}
    assert got["d"] == pytest.approx((1.0 - 0.85) / 4, abs=1e-12)
    # total mass <= 1 (dangling variant drops, never creates, mass)
    assert sum(got.values()) <= 1.0 + 1e-9


def test_pagerank_unweighted_counts_duplicates(spark):
    # two parallel a->b edges ~ weight 2
    dup = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "c"), ("c", "b")], "src string, dst string"
    )
    got = {r.node: r.rank for r in pagerank(dup, iterations=3).collect()}
    want = _py_pagerank(
        [("a", "b", 2.0), ("a", "c", 1.0), ("c", "b", 1.0)], iterations=3
    )
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def _py_triangles(pairs):
    """Brute force over the canonical undirected edge set."""
    import itertools

    es = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    nodes = sorted({x for e in es for x in e})
    adj = {v: set() for v in nodes}
    for a, b in es:
        adj[a].add(b)
        adj[b].add(a)
    tri = dict.fromkeys(nodes, 0)
    for a, b, c in itertools.combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for v in (a, b, c):
                tri[v] += 1
    return {
        v: (len(adj[v]), tri[v]) for v in nodes
    }


TRI_PAIRS = [
    (1, 2), (2, 3), (1, 3),          # triangle
    (3, 4), (4, 5), (3, 5),          # second triangle sharing node 3
    (5, 6),                          # pendant edge
    (2, 1),                          # reversed duplicate
    (7, 7),                          # self-loop: dropped
    (1, 4),                          # closes (1,3,4)
]


def test_triangle_counts_match_brute_force(spark):
    df = spark.createDataFrame(TRI_PAIRS, "a int, b int")
    got = {r.node: (r.degree, r.triangles, r.clustering)
           for r in triangle_counts(df).collect()}
    want = _py_triangles(TRI_PAIRS)
    assert set(got) == set(want)
    for v, (deg, tri) in want.items():
        gdeg, gtri, gclust = got[v]
        assert (gdeg, gtri) == (deg, tri), v
        expect_c = 0.0 if deg < 2 else round(2.0 * tri / (deg * (deg - 1.0)), 6)
        assert gclust == pytest.approx(expect_c, abs=1e-9), v


def test_triangle_counts_hub_graph(spark):
    # star + one rim edge: exactly one triangle, hub degree high —
    # exercises the degree-orientation branch (hub is never a wedge apex)
    pairs = [(0, i) for i in range(1, 30)] + [(1, 2)]
    df = spark.createDataFrame(pairs, "a int, b int")
    got = {r.node: r.triangles for r in triangle_counts(df).collect()}
    assert got[0] == 1 and got[1] == 1 and got[2] == 1
    assert all(got[i] == 0 for i in range(3, 30))


def test_cooccurrence_edges_mega_group_capped(spark):
    from prom_spark.operators.graph import cooccurrence_edges

    # one mega-basket with 500 items plus two normal baskets; the cap
    # must bound the mega-basket's pair fan-out at C(cap, 2) while
    # leaving the normal baskets (and their support-2 edge) untouched
    rows = [(0, i) for i in range(500)]
    rows += [(1, 1), (1, 2), (1, 3), (2, 1), (2, 2)]
    df = spark.createDataFrame(rows, "o long, p long")
    cap = 16
    edges = cooccurrence_edges(
        df, "o", "p", min_support=1, max_items_per_group=cap
    )
    got = {(r.a, r.b) for r in edges.collect()}
    # mega-basket contributes exactly the capped (lowest-`cap`-items)
    # pair set — C(16, 2) = 120 pairs over items 0..15
    mega = {(a, b) for a in range(cap) for b in range(a + 1, cap)}
    normal = {(1, 2), (1, 3), (2, 3)}
    assert got == mega | normal
    # support threshold still applies after capping: the capped
    # mega-basket retains items 1,2,3, lifting exactly the pairs the
    # normal baskets repeat to support >= 2
    sup2 = cooccurrence_edges(
        df, "o", "p", min_support=2, max_items_per_group=cap
    )
    assert {(r.a, r.b) for r in sup2.collect()} == {(1, 2), (1, 3), (2, 3)}


def test_cooccurrence_edges_dedups_group_items(spark):
    from prom_spark.operators.graph import cooccurrence_edges

    # duplicate (group, item) rows must not inflate support
    df = spark.createDataFrame(
        [(0, 1), (0, 1), (0, 2)], "o long, p long"
    )
    out = cooccurrence_edges(df, "o", "p", min_support=2)
    assert out.count() == 0
