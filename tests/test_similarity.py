"""Unit tests for scalar similarity expressions (SURVEY.md §2.8)."""

import math

from pyspark.sql import functions as F

from prom_spark.functions.similarity import (
    binary_positive_sim,
    cosine_sim,
    interval_overlap_sim,
    norm_levenshtein,
    set_context_sim,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_norm_levenshtein_basic(spark):
    df = spark.createDataFrame(
        [("felix", "alex"), ("alex", "alex"), ("jon", "john"), ("", "")],
        "s1 string, s2 string",
    )
    vals = [r.v for r in df.select(norm_levenshtein("s1", "s2").alias("v")).collect()]
    assert math.isclose(vals[0], 1 - 3 / 5)
    assert vals[1] == 1.0
    assert math.isclose(vals[2], 0.75)
    assert vals[3] == 1.0  # both empty


def test_cosine_sim_edge_cases(spark):
    cases = [
        ([1.0, 0.0], [1.0, 0.0], 1.0),
        ([1.0, 0.0], [0.0, 1.0], 0.0),
        ([0.0, 0.0], [0.0, 0.0], 1.0),  # both zero-norm -> 1 (reference :86-87)
        ([0.0, 0.0], [1.0, 0.0], 0.0),  # one zero-norm -> 0 (reference :84-85)
        ([1.0, 2.0], [2.0, 4.0], 1.0),
    ]
    df = spark.createDataFrame(
        [(a, b) for a, b, _ in cases], "a array<double>, b array<double>"
    )
    got = [r.v for r in df.select(cosine_sim("a", "b").alias("v")).collect()]
    for (_, _, want), g in zip(cases, got):
        assert math.isclose(g, want, abs_tol=1e-12)


def test_positive_sim(spark):
    # both-1 positions / max(1, either-1 positions) (reference :92-101)
    df = spark.createDataFrame(
        [([1, 0, 1, 0], [1, 1, 0, 0]), ([0, 0], [0, 0])],
        "a array<int>, b array<int>",
    )
    got = [r.v for r in df.select(binary_positive_sim("a", "b").alias("v")).collect()]
    assert math.isclose(got[0], 1 / 3)
    assert got[1] == 0.0


def test_context_sim(spark):
    df = spark.createDataFrame(
        [(["a", "b", "c"], ["b", "c", "d", "e"])],
        "a array<string>, b array<string>",
    )
    got = df.select(set_context_sim("a", "b").alias("v")).collect()[0].v
    assert math.isclose(got, 2 / 4)


def test_interval_overlap_cases(spark):
    # (min1, max1, min2, max2, expected_sim, expected_disjoint)
    cases = [
        (0.0, 13.0, 10.0, 30.0, 3 / 20, False),   # bounded overlap (onto fixture)
        (0.0, 10.0, 0.0, 10.0, 1.0, False),        # equal -> equivalence
        (None, None, None, None, 1.0, False),      # both absent -> equal bounds
        (None, None, 0.0, 1.0, 0.0, False),        # one unbounded -> no info
        (0.0, None, None, 5.0, 0.7, False),        # half-bounded overlap
        (10.0, None, None, 5.0, 0.0, True),        # provably disjoint
        (0.0, 5.0, 7.0, None, 0.0, True),          # bounded vs half, disjoint
        (0.0, 5.0, 3.0, None, 0.7, False),         # bounded vs half, overlap
    ]
    df = spark.createDataFrame(
        [(a, b, c, d) for a, b, c, d, _, _ in cases],
        "min1 double, max1 double, min2 double, max2 double",
    )
    got = df.select(
        interval_overlap_sim("min1", "max1", "min2", "max2").alias("r")
    ).collect()
    for (case, row) in zip(cases, got):
        assert math.isclose(row.r.sim, case[4], abs_tol=1e-12), case
        assert row.r.disjoint == case[5], case
