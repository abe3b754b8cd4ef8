"""ABox matcher tests against hand-computed reference semantics
(fixture individuals from reference src/onto_a.py:51-55 /
src/onto_fr.py:78-89; expected pairs follow the reference's weighting
.2 label + .8 structure with dp/opo/opi = .4/.3/.3)."""

import math

import pytest

from prom_spark import fixtures
from prom_spark.matchers.abox import abox_match, abox_scores, subclass_closure
from prom_spark.pipeline.tbox import OntologyTables, align_tbox


@pytest.fixture(scope="module")
def tbox_alignment(spark):
    def tables(onto):
        return OntologyTables(
            labels=fixtures.onto_labels(spark).filter(f"onto = '{onto}'"),
            class_axioms=fixtures.class_axioms(spark).filter(f"onto = '{onto}'"),
            op_axioms=fixtures.op_axioms(spark).filter(f"onto = '{onto}'"),
            dp_axioms=fixtures.dp_axioms(spark).filter(f"onto = '{onto}'"),
        )

    return align_tbox(
        tables("a"),
        tables("fr"),
        fixtures.alias_dictionary(spark),
        fixtures.domain_vocabulary(spark),
    ).cache()


def test_subclass_closure(spark):
    ax = fixtures.class_axioms(spark).filter("onto = 'a'")
    got = {
        (r.descendant.split("#")[1], r.ancestor.split("#")[1])
        for r in subclass_closure(ax).collect()
    }
    assert ("car", "merhcandise") in got
    assert ("someVeryGoodResource", "resource") in got
    assert ("transfer", "process") in got


@pytest.fixture(scope="module")
def abox_selection(spark, tbox_alignment):
    inds = fixtures.individuals(spark).cache()
    pvs = fixtures.prop_values(spark).cache()
    return abox_match(
        inds.filter("onto = 'a'"),
        inds.filter("onto = 'fr'"),
        pvs.filter("onto = 'a'"),
        pvs.filter("onto = 'fr'"),
        tbox_alignment,
        fixtures.class_axioms(spark).filter("onto = 'a'"),
        fixtures.class_axioms(spark).filter("onto = 'fr'"),
    ).collect()


def test_abox_match_fixture(spark, abox_selection):
    got = {
        (r.ind1.split("#")[1], r.ind2.split("#")[1]): r.rating
        for r in abox_selection
    }
    # length-value matches drive the alignment: mm_i <-> aa_j iff values equal
    assert set(got) == {
        ("mm1", "aa5"), ("mm2", "aa4"), ("mm3", "aa3"), ("mm4", "aa2"), ("mm5", "aa1")
    }
    # mm4/aa2: dp dims duration(=1.0 score) + length(subset 0.5) ->
    # cos = 1.5 / (sqrt(2) * sqrt(1.25)) = .94868; rating = .8*.4*that
    assert math.isclose(got[("mm4", "aa2")], 0.8 * 0.4 * (1.5 / (2**0.5 * 1.25**0.5)), rel_tol=1e-9)
    # exact value matches: dp cos = 1 -> rating .8 * .4
    assert math.isclose(got[("mm2", "aa4")], 0.32, rel_tol=1e-9)


def test_blocking_excludes_subclass_owned(spark, abox_selection):
    """mm1 (a car) must not appear in the merhcandise x a block — car is
    itself aligned (car = voiture), so mm1 only pairs with aa5."""
    mm1 = [r for r in abox_selection if r.ind1.endswith("#mm1")]
    assert len(mm1) == 1 and mm1[0].ind2.endswith("#aa5")


def test_q30_abox_oracle_query(spark):
    """The q30 oracle entry (ABox chain over the typed golden alignment,
    fixtures.abox_reference_tbox) must select the same individual pairs
    as the align_tbox-driven chain — the blocking classes and DP/OP dims
    coincide on the fixture — with ratings at 6-decimal precision."""
    import math

    from prom_spark.queries import q30_abox_match

    got = {
        (r.ind1.split("#")[1], r.ind2.split("#")[1]): r.rating
        for r in q30_abox_match(spark, "").collect()
    }
    assert set(got) == {
        ("mm1", "aa5"), ("mm2", "aa4"), ("mm3", "aa3"), ("mm4", "aa2"), ("mm5", "aa1")
    }
    assert math.isclose(got[("mm2", "aa4")], 0.32, rel_tol=1e-6)


def test_abox_plan_has_no_pair_dims_expansion(spark, tbox_alignment):
    """The dp/op scoring must never build the |pairs| x |dims| grid: the
    physical plan may contain no cartesian/nested-loop join (the only way
    an unkeyed pairs x dims product can execute)."""
    inds = fixtures.individuals(spark)
    pvs = fixtures.prop_values(spark)
    out = abox_scores(
        inds.filter("onto = 'a'"),
        inds.filter("onto = 'fr'"),
        pvs.filter("onto = 'a'"),
        pvs.filter("onto = 'fr'"),
        tbox_alignment,
        fixtures.class_axioms(spark).filter("onto = 'a'"),
        fixtures.class_axioms(spark).filter("onto = 'fr'"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
