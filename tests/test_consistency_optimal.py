"""G2-replacement consistency validation + W2 optimal 1:1 selection."""

import itertools

import pytest
from pyspark.sql import functions as F

from prom_spark.operators.consistency import (
    drop_conflicting_equivalences,
    find_conflicts,
)
from prom_spark.operators.selection import greedy_one_to_one, optimal_one_to_one

MATCH = "elem_type string, iri1 string, iri2 string, relation string, rating double"


def test_find_conflicts(spark):
    equiv = spark.createDataFrame(
        [
            ("owl:Class", "a1", "b1", "equivalence", 0.9),
            ("owl:Class", "b1", "c1", "equivalence", 0.8),
            ("owl:Class", "x1", "y1", "equivalence", 0.7),
        ],
        MATCH,
    )
    disj = spark.createDataFrame(
        [
            ("owl:Class", "a1", "c1", "disjoint", 0.85),  # same cluster -> conflict
            ("owl:Class", "a1", "x1", "disjoint", 0.6),   # different clusters -> fine
        ],
        MATCH,
    )
    got = find_conflicts(equiv, disj).collect()
    assert len(got) == 1
    assert (got[0].iri1, got[0].iri2) == ("a1", "c1")


def test_drop_conflicting_equivalences(spark):
    equiv = spark.createDataFrame(
        [
            ("owl:Class", "a1", "b1", "equivalence", 0.9),   # stronger than disjoint -> kept
            ("owl:Class", "b1", "c1", "equivalence", 0.7),   # weaker -> dropped
            ("owl:Class", "x1", "y1", "equivalence", 0.5),   # untouched cluster
        ],
        MATCH,
    )
    disj = spark.createDataFrame(
        [("owl:Class", "a1", "c1", "disjoint", 0.85)], MATCH
    )
    kept = {(r.iri1, r.iri2) for r in drop_conflicting_equivalences(equiv, disj).collect()}
    assert kept == {("a1", "b1"), ("x1", "y1")}
    # after the repair the conflict is gone
    repaired = drop_conflicting_equivalences(equiv, disj)
    assert find_conflicts(repaired, disj).count() == 0


def _brute_force_optimal(rows):
    """Exhaustive max-weight 1:1 matching over (u1, u2, rating) tuples."""
    best, best_sum = [], -1.0
    for k in range(len(rows) + 1):
        for combo in itertools.combinations(range(len(rows)), k):
            u1 = [rows[i][0] for i in combo]
            u2 = [rows[i][1] for i in combo]
            if len(set(u1)) == len(u1) and len(set(u2)) == len(u2):
                s = sum(rows[i][2] for i in combo)
                if s > best_sum + 1e-12:
                    best_sum, best = s, combo
    return best_sum


def test_optimal_matches_brute_force(spark):
    import random

    rnd = random.Random(13)
    rows = [
        (f"L{i}", f"R{j}", round(rnd.random(), 3))
        for i in range(5)
        for j in range(5)
        if rnd.random() < 0.5
    ]
    df = spark.createDataFrame(rows, "uid1 string, uid2 string, rating double")
    sel = optimal_one_to_one(df, "uid1", "uid2").collect()
    # 1:1 constraint holds
    assert len({r.uid1 for r in sel}) == len(sel)
    assert len({r.uid2 for r in sel}) == len(sel)
    got_sum = sum(r.rating for r in sel)
    assert got_sum == pytest.approx(_brute_force_optimal(rows))


def test_optimal_beats_or_ties_greedy(spark):
    # classic greedy trap: greedy takes (a,x,.9) and blocks the better
    # pair (a,y,.8)+(b,x,.8)
    rows = [("a", "x", 0.9), ("a", "y", 0.8), ("b", "x", 0.8)]
    df = spark.createDataFrame(rows, "uid1 string, uid2 string, rating double")
    g = sum(r.rating for r in greedy_one_to_one(df, "uid1", "uid2").collect())
    o = sum(r.rating for r in optimal_one_to_one(df, "uid1", "uid2").collect())
    assert g == pytest.approx(0.9)
    assert o == pytest.approx(1.6)


def test_optimal_large_block_falls_back_to_greedy(spark):
    rows = [(f"L{i}", f"R{j}", 0.5 + 0.001 * (i + j)) for i in range(6) for j in range(6)]
    df = spark.createDataFrame(rows, "uid1 string, uid2 string, rating double")
    sel = optimal_one_to_one(df, "uid1", "uid2", max_block_edges=10).collect()
    want = {
        (r.uid1, r.uid2) for r in greedy_one_to_one(df, "uid1", "uid2").collect()
    }
    assert {(r.uid1, r.uid2) for r in sel} == want


def test_drop_conflicts_converges_on_strong_bridge(spark):
    """Two strong equivalence edges bridging disjoint endpoints through a
    middle node: the threshold rule alone removes nothing, so the repair
    must fall back to dropping the weakest cluster edge until
    find_conflicts is empty."""
    equiv = spark.createDataFrame(
        [("a", "b", 0.9), ("b", "c", 0.9)], "iri1 string, iri2 string, rating double"
    )
    disj = spark.createDataFrame(
        [("a", "c", 0.85)], "iri1 string, iri2 string, rating double"
    )
    repaired = drop_conflicting_equivalences(equiv, disj)
    assert find_conflicts(repaired, disj).count() == 0
    # deterministic: the (rating, iri1, iri2)-weakest edge (a, b) goes
    kept = {(r.iri1, r.iri2) for r in repaired.collect()}
    assert kept == {("b", "c")}


def test_optimal_handles_negative_ratings(spark):
    """Branch-and-bound upper bound must not prune the optimum when
    negative-rated edges are present."""
    from prom_spark.operators.selection import optimal_one_to_one

    rows = [
        ("x1", "y1", 0.5),
        ("x1", "y2", -0.4),
        ("x2", "y1", 0.45),
        ("x2", "y2", 0.4),
    ]
    df = spark.createDataFrame(rows, "iri1 string, iri2 string, rating double")
    got = {(r.iri1, r.iri2) for r in optimal_one_to_one(df).collect()}
    # optimum: x1-y1 (.5) + x2-y2 (.4) = .9 beats x2-y1+x1-y2 = .05
    assert got == {("x1", "y1"), ("x2", "y2")}
