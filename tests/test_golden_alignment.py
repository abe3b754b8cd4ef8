"""Golden e2e: TBox alignment on the onto-a × onto-fr fixture must hit
P/R >= 0.95 against the reference alignment (BASELINE.md targets; the
reference's interactive mode achieves P=1.0/R=1.0 on this dataset per
docs/plots/benchmark-results.csv rows 4/12)."""

import pytest

from prom_spark import fixtures
from prom_spark.pipeline.quality import assess
from prom_spark.pipeline.tbox import OntologyTables, align_tbox


@pytest.fixture(scope="module")
def accepted(spark):
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


def test_golden_precision_recall(spark, accepted):
    report = assess(accepted, fixtures.reference_alignment(spark))
    assert report.precision >= 0.95, report
    assert report.recall >= 0.95, report


def test_known_ratings(spark, accepted):
    """Spot-check blended ratings against the reference scoring math."""
    got = {
        (r.iri1.split("#")[1], r.iri2.split("#")[1], r.relation): round(r.rating, 4)
        for r in accepted.collect()
    }
    # (.9 sem + 1.0 op struct) / 2 — produce/ex_op: attrs cos=1, dom+rng aligned
    assert got[("produce", "ex_op", "equivalence")] == 0.95
    # (.9 + (1*.3 + .3 + .3 + 0)/1) / 2 — distance/di
    assert got[("distance", "di", "equivalence")] == 0.9
    # (.9 + .645)/2 — width/rel: interval overlap 3/20
    assert got[("width", "rel", "hypernym")] == 0.7725
    # inverse/disjoint ratings pass through unblended
    assert got[("succeeds", "successeur", "inverse")] == 0.6
    assert got[("lower", "souleve", "disjoint")] == 0.6


def test_full_pipeline_beats_string_floor(spark, accepted):
    """The reference reports the Levenshtein-only baseline next to the
    full pipeline (src/prom.py:197-198); the full pipeline must beat
    that floor on the golden fixture."""
    from prom_spark.matchers.string_matcher import baseline_alignment

    base = baseline_alignment(
        fixtures.onto_labels(spark).filter("onto = 'a'"),
        fixtures.onto_labels(spark).filter("onto = 'fr'"),
    )
    ref = fixtures.reference_alignment(spark)
    floor = assess(base, ref)
    full = assess(accepted, ref)
    # the floor cannot see synonyms/disjoints/inverses: recall is well
    # below the full pipeline's
    assert floor.recall < full.recall
    assert floor.fmeasure < full.fmeasure
    assert full.fmeasure >= 0.95
    # sanity: the floor still finds the trivially-identical labels
    assert floor.n_correct >= 5
