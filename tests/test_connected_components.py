"""Connected-components unit tests (G1 canonicalization core)."""

import random

from prom_spark.operators.connected_components import connected_components


def _cc_oracle(edges):
    """Plain-python union-find oracle."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


def test_cc_known_graph(spark):
    edges = [("a", "b"), ("b", "c"), ("d", "e"), ("f", "f"), ("g", "h")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == {
        "a": "a", "b": "a", "c": "a",
        "d": "d", "e": "d",
        "g": "g", "h": "g",
    }


def test_cc_chain_and_random(spark):
    rnd = random.Random(7)
    # long chain (worst case for naive propagation) + random clutter
    edges = [(f"n{i:03d}", f"n{i+1:03d}") for i in range(60)]
    edges += [
        (f"m{rnd.randrange(50):03d}", f"m{rnd.randrange(50):03d}")
        for _ in range(80)
    ]
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.component for r in connected_components(df).collect()}
    want = _cc_oracle(edges)
    # compare cluster partitions via canonical min representative
    assert got == want
