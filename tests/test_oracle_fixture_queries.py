"""Gates for the q33/q34 oracle fixtures' DISCRIMINATING properties.

Parity (Spark == DuckDB twin) proves both engines agree; these tests
pin what the fixtures were designed to distinguish, so a regression
that makes both sides agree on the WRONG thing (e.g. optimal selection
silently degrading to greedy would still satisfy a greedy twin) is
caught in the suite, against hand-verified expectations.
"""

import pytest
from pyspark.sql import functions as F

from prom_spark.queries import q33_optimal_selection, q34_consistency_conflicts

SF_DIR = "/root/testdata/sf0.001"


def test_q33_optimal_beats_greedy_on_fixture(spark):
    """The arithmetic fixture's odd block traps greedy (+0.4 for the
    exact matching) and its even block contains a feasible NEGATIVE
    edge greedy takes but the optimum drops — verified by exhaustive
    enumeration offline. 4 kept edges, none negative."""
    rows = {
        (r.n_name, r.r_name, r.rating)
        for r in q33_optimal_selection(spark, SF_DIR).collect()
    }
    assert rows == {
        ("NATION_2", "AFRICA", 1.2),
        ("NATION_3", "ASIA", 1.3),
        ("NATION_5", "MIDDLE EAST", 1.1),
        ("NATION_7", "EUROPE", 0.6),
    }
    # the greedy selector on the same edges keeps a DIFFERENT set — the
    # fixture genuinely discriminates W2 from W1
    from prom_spark.operators.selection import greedy_one_to_one

    n = (
        spark.read.parquet(f"{SF_DIR}/nation.parquet")
        .filter(F.col("n_nationkey") < 8)
        .select("n_nationkey", "n_name")
    )
    r = spark.read.parquet(f"{SF_DIR}/region.parquet")
    edges = (
        n.crossJoin(r)
        .filter(
            ((F.col("n_nationkey") % 2 == 0) & F.col("r_regionkey").isin(0, 1))
            | ((F.col("n_nationkey") % 2 == 1) & F.col("r_regionkey").isin(2, 3, 4))
        )
        .select(
            "n_name",
            "r_name",
            (
                (
                    (
                        F.col("n_nationkey") * F.col("r_regionkey")
                        + F.col("n_nationkey") * 8
                        + F.col("r_regionkey") * 3
                    )
                    % 19
                ).cast("double")
                / 10.0
                - 0.4
            ).alias("rating"),
        )
    )
    greedy = {
        (x.n_name, x.r_name)
        for x in greedy_one_to_one(
            edges, uid1_col="n_name", uid2_col="r_name"
        ).collect()
    }
    assert greedy != {(a, b) for a, b, _ in rows}
    # and the optimum's total strictly exceeds greedy's on the same edges
    w = {(x.n_name, x.r_name): x.rating for x in edges.collect()}
    assert sum(w[p] for p in {(a, b) for a, b, _ in rows}) > sum(
        w[p] for p in greedy
    ) + 1e-9


def test_q34_conflicts_exact_rows(spark):
    """Exactly the two in-cluster disjoints conflict; cross-cluster and
    outside-any-cluster disjoints do not."""
    rows = {
        (r.iri1, r.iri2, r.rating, r.component)
        for r in q34_consistency_conflicts(spark, SF_DIR).collect()
    }
    assert rows == {
        ("NATION_1", "NATION_3", 0.89, "NATION_0"),
        ("NATION_11", "NATION_13", 0.79, "NATION_10"),
    }
