"""Distributed greedy 1:1 selection vs the reference fixture
(reference src/alignment_selector.py:180-208, src/string_matcher.py:53-63)."""

import math

from pyspark.sql import functions as F

from prom_spark import fixtures
from prom_spark.functions.similarity import norm_levenshtein
from prom_spark.operators.selection import best_candidate_per_left, greedy_one_to_one


def _scored_fixture(spark):
    return fixtures.selection_fixture(spark).withColumn(
        "rating", norm_levenshtein("name1", "name2")
    )


def test_greedy_matches_reference_fixture(spark):
    scored = _scored_fixture(spark)
    sel = greedy_one_to_one(
        scored, uid1_col="uid1", uid2_col="uid2", threshold=0.6
    ).collect()
    got = {(r.uid1, r.uid2): r.rating for r in sel}
    # greedy at threshold .6 (strict >): alex<->alex (1.0), jon<->john (.75);
    # (alex,alec) and (blex,alex) conflict on taken sides
    assert set(got) == {("1:a", "2:ax"), ("1:jo", "2:j")}
    assert math.isclose(sum(got.values()), 1.75)


def test_greedy_equals_sequential_greedy_random(spark):
    """Distributed locally-dominant selection == sequential greedy under
    the same total order, on a deterministic pseudo-random instance."""
    import random

    rnd = random.Random(42)
    rows = [
        (f"L{i}", f"R{j}", round(rnd.random(), 6))
        for i in range(40)
        for j in range(30)
        if rnd.random() < 0.3
    ]
    df = spark.createDataFrame(rows, "uid1 string, uid2 string, rating double")
    got = {
        (r.uid1, r.uid2)
        for r in greedy_one_to_one(df, "uid1", "uid2", threshold=0.1).collect()
    }
    # sequential greedy with total order (rating desc, uid1, uid2)
    taken1, taken2, want = set(), set(), set()
    for u1, u2, r in sorted(rows, key=lambda x: (-x[2], x[0], x[1])):
        if r > 0.1 and u1 not in taken1 and u2 not in taken2:
            taken1.add(u1)
            taken2.add(u2)
            want.add((u1, u2))
    assert got == want


def test_threshold_is_strict(spark):
    df = spark.createDataFrame(
        [("a", "b", 0.6), ("c", "d", 0.61)], "uid1 string, uid2 string, rating double"
    )
    got = greedy_one_to_one(df, "uid1", "uid2", threshold=0.6).collect()
    assert [(r.uid1, r.uid2) for r in got] == [("c", "d")]


def test_best_candidate_per_left(spark):
    df = spark.createDataFrame(
        [("m1", "e1", 0.9), ("m1", "e2", 0.8), ("m2", "e1", 0.7), ("m3", "e9", 0.2)],
        "mention_id string, entity_id string, rating double",
    )
    got = {
        (r.mention_id, r.entity_id)
        for r in best_candidate_per_left(df, threshold=0.5).collect()
    }
    assert got == {("m1", "e1"), ("m2", "e1")}


def test_agg_selection_equals_window_selection(spark):
    """best_candidate_per_left_agg must reproduce the window variant's
    choices exactly (max rating per key, ties to ascending payload)."""
    import random

    from prom_spark.operators.selection import best_candidate_per_left_agg

    rnd = random.Random(7)
    rows = [
        (f"k{rnd.randrange(20)}", f"E{rnd.randrange(9)}", f"g{rnd.randrange(4)}",
         round(rnd.choice([0.3, 0.5, 0.7, 0.7, 0.9]), 6))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "k string, entity_id string, gram string, rating double").distinct()
    # window path: within key order by rating desc then entity_id, gram
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy(
        F.col("rating").desc(), F.col("entity_id"), F.col("gram")
    )
    want = {
        tuple(r)
        for r in df.withColumn("_r", F.row_number().over(w))
        .filter("_r = 1").drop("_r").filter("rating > 0.4").collect()
    }
    got = {
        tuple(r)
        for r in best_candidate_per_left_agg(
            df, key_cols=["k"], payload_cols=["entity_id", "gram"], threshold=0.4
        ).select("k", "entity_id", "gram", "rating").collect()
    }
    assert got == want


def test_best_candidate_longest_match_first(spark):
    """A9: dedicated gate for grouped-max longest-match selection — with
    a longest-gram extra_order the longer surface form wins its span
    even at a lower rating; without it, rating wins."""
    from pyspark.sql import functions as F

    from prom_spark.operators.selection import best_candidate_per_left

    rows = [
        ("m1", "E1", 0.9, "ab"),
        ("m1", "E2", 0.7, "abcd"),
        ("m2", "E3", 0.5, "x"),
    ]
    df = spark.createDataFrame(
        rows, "mention_id string, entity_id string, rating double, gram string"
    )
    longest = {
        r.mention_id: r.entity_id
        for r in best_candidate_per_left(
            df, extra_order=[F.length("gram").desc()]
        ).collect()
    }
    assert longest == {"m1": "E2", "m2": "E3"}
    by_rating = {
        r.mention_id: r.entity_id for r in best_candidate_per_left(df).collect()
    }
    assert by_rating == {"m1": "E1", "m2": "E3"}
