"""A7 contradiction pruning vs the reference's reduce_vector semantics
(reference src/compare_by_labels.py:346-375)."""

from prom_spark.operators.contradictions import reduce_vector

MATCH = "elem_type string, iri1 string, iri2 string, relation string, rating double"


def _run(spark, rows):
    df = spark.createDataFrame(rows, MATCH)
    return {
        (r.iri1, r.iri2, r.relation, r.rating) for r in reduce_vector(df).collect()
    }


def test_rule1_duplicate_pair_keeps_max_and_prefers_equivalence(spark):
    got = _run(
        spark,
        [
            ("owl:Class", "a", "b", "hyponym", 0.9),
            ("owl:Class", "a", "b", "equivalence", 0.7),   # lower -> dropped
            ("owl:Class", "a", "b", "hypernym", 0.9),      # tie at max with hyponym
            ("owl:Class", "a", "b", "equivalence", 0.9),   # equivalence wins the tie
        ],
    )
    assert got == {("a", "b", "equivalence", 0.9)}


def test_rule2_equivalence_unique_per_side(spark):
    got = _run(
        spark,
        [
            ("owl:Class", "a", "x", "equivalence", 0.9),
            ("owl:Class", "a", "y", "equivalence", 0.8),  # loses iri1 group
            ("owl:Class", "b", "x", "equivalence", 0.8),  # loses iri2 group
            ("owl:Class", "b", "z", "equivalence", 0.7),  # b taken? b's best is (b,x) which lost -> must it win?
        ],
    )
    # (a,x) wins both sides; (a,y)/(b,x) are dominated; (b,z) loses its
    # iri1 group to (b,x) (rank 2) even though (b,x) itself lost — the
    # reference's pairwise rule drops any row with a stronger same-side
    # equivalence, regardless of that row's own fate.
    assert got == {("a", "x", "equivalence", 0.9)}


def test_rule2_does_not_touch_other_relations(spark):
    got = _run(
        spark,
        [
            ("owl:Class", "a", "x", "disjoint", 0.9),
            ("owl:Class", "a", "y", "disjoint", 0.8),
        ],
    )
    assert len(got) == 2


def test_rule3_subsumption_dominated_by_equivalence(spark):
    got = _run(
        spark,
        [
            ("owl:Class", "a", "x", "equivalence", 0.9),
            ("owl:Class", "a", "y", "hyponym", 0.7),   # same iri1, weaker -> dropped
            ("owl:Class", "b", "y", "hypernym", 0.8),  # iri2 y: no stronger eq -> kept
        ],
    )
    assert ("a", "y", "hyponym", 0.7) not in got
    assert ("b", "y", "hypernym", 0.8) in got
    assert ("a", "x", "equivalence", 0.9) in got


def test_deterministic_on_rating_ties(spark):
    rows = [
        ("owl:Class", "a", "x", "equivalence", 0.8),
        ("owl:Class", "a", "y", "equivalence", 0.8),
    ]
    got1 = _run(spark, rows)
    got2 = _run(spark, list(reversed(rows)))
    # canonical order (rating desc, iri1, iri2): x beats y, input-order free
    assert got1 == got2 == {("a", "x", "equivalence", 0.8)}
