"""Discriminating-property gates for q47-q49 (quantiles/tf-idf/PMI)."""

import pytest
from pyspark.sql import functions as F


def test_exact_quantiles_known_sequence(spark):
    # values 1..101 per group: p50=51, p90=91, p99=100.0 exactly (the
    # (n-1)*q rank lands on integers for n=101)
    rows = [("g", float(i)) for i in range(1, 102)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    got = (
        df.groupBy("event_type")
        .agg(F.percentile("value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))).alias("q"))
        .collect()[0]
    )
    assert got.q == [51.0, 91.0, 100.0]


@pytest.fixture(scope="module")
def mini_docs(spark):
    # 'common' appears in every doc; 'rare' only in doc 0 (twice)
    rows = [
        (0, "rare rare common alpha beta"),
        (1, "common alpha alpha gamma delta"),
        (2, "common beta gamma gamma epsilon"),
        (3, "common delta epsilon epsilon alpha"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tfidf_rare_term_beats_ubiquitous(spark, mini_docs, tmp_path):
    import prom_spark.queries as Q

    # route the query at a parquet dir shaped like the driver tables
    d = str(tmp_path)
    mini_docs.write.parquet(f"{d}/documents.parquet")
    out = Q.q48_tfidf_topterms(spark, d).collect()
    top_doc0 = [r.term for r in sorted(out, key=lambda r: r.rk) if r.doc_id == 0]
    # doc 0's top term must be 'rare' (tf=2, df=1), never 'common'
    assert top_doc0[0] == "rare"
    assert all(r.term != "common" or r.rk > 1 for r in out if r.doc_id == 0)
    # every doc got exactly 3 ranked terms with rk 1..3
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.rk)
    assert all(sorted(v) == [1, 2, 3] for v in by_doc.values())


def test_pmi_perfect_collocation_ranks_first(spark, tmp_path):
    import prom_spark.queries as Q

    # 'neural network' always adjacent (8x, passes min-count); filler
    # bigrams are frequent but independent
    filler = "the cat the dog the cat the dog the fox"
    rows = [(i, f"neural network {filler}") for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path)
    docs.write.parquet(f"{d}/documents.parquet")
    out = sorted(Q.q49_pmi_collocations(spark, d).collect(), key=lambda r: r.rk)
    assert (out[0].a, out[0].b) == ("neural", "network")
    # PMI of the exclusive pair exceeds every filler pair
    assert out[0].pmi > out[1].pmi


def test_weighted_sample_prefers_heavy_items(spark, tmp_path):
    import prom_spark.queries as Q

    # 100 groups; in each, item 0 has weight 50 and items 1..30 weight 1.
    # P(heavy in 10-of-31 weighted-without-replacement draws) is ~1;
    # under UNIFORM sampling it would be ~10/31.
    rows = []
    eid = 0
    for g in range(100):
        for i in range(31):
            rows.append((eid, f"g{g}", 50.0 if i == 0 else 1.0))
            eid += 1
    import datetime as dt

    df = spark.createDataFrame(
        [(e, t, v, dt.datetime(2024, 1, 1)) for e, t, v in rows],
        "event_id long, event_type string, value double, ts timestamp",
    )
    d = str(tmp_path)
    df.write.parquet(f"{d}/events.parquet")
    out = Q.q52_weighted_sample(spark, d).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r.event_type, []).append(r.value)
    assert len(by_group) == 100 and all(len(v) == 10 for v in by_group.values())
    heavy_rate = sum(1 for v in by_group.values() if 50.0 in v) / 100
    assert heavy_rate > 0.9, heavy_rate  # weighted: ~1.0; uniform: ~0.32


def test_retention_new_vs_returning(spark, tmp_path):
    import datetime as dt

    import prom_spark.queries as Q

    rows = [
        # day1: users 1,2 new; day2: 1 returns, 3 new; day3: 3 returns
        (1, 1, dt.datetime(2024, 1, 1, 5)), (2, 2, dt.datetime(2024, 1, 1, 6)),
        (3, 1, dt.datetime(2024, 1, 2, 5)), (4, 3, dt.datetime(2024, 1, 2, 6)),
        (5, 3, dt.datetime(2024, 1, 3, 5)),
        # same-day duplicate events must not double-count the user
        (6, 3, dt.datetime(2024, 1, 3, 9)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    d = str(tmp_path)
    df.write.parquet(f"{d}/events.parquet")
    out = {r.day: (r.n_active, r.n_new, r.n_returning)
           for r in Q.q54_retention(spark, d).collect()}
    assert out == {
        "2024-01-01": (2, 2, 0),
        "2024-01-02": (2, 1, 1),
        "2024-01-03": (1, 0, 1),
    }


def test_q47_approx_percentile_scale_path(spark):
    """q47's docstring names approx_percentile as the 10^12-row plan
    (exact `percentile` buffers every group value; the t-digest sketch
    is mergeable/map-side-combinable). Make the claim executable: at
    sf0.001 the approximate result with a tight accuracy parameter must
    land within tolerance of the exact anchor for every group/quantile
    (the exact/approx pattern of the ANN recall gate)."""
    import os

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        pytest.skip("driver testdata missing")
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    probs = [0.5, 0.9, 0.99]
    eps = 0.01  # rank tolerance: accuracy=10000 guarantees ~1/10000,
    #             but approx returns an ACTUAL value (no interpolation),
    #             so allow one percentile of rank slack around each p
    lo = [max(p - eps, 0.0) for p in probs]
    hi = [min(p + eps, 1.0) for p in probs]
    exact = {
        r.event_type: (r.lo, r.hi)
        for r in e.groupBy("event_type")
        .agg(
            F.percentile("value", F.array(*[F.lit(p) for p in lo])).alias("lo"),
            F.percentile("value", F.array(*[F.lit(p) for p in hi])).alias("hi"),
        )
        .collect()
    }
    approx = {
        r.event_type: r.q
        for r in e.groupBy("event_type")
        .agg(
            F.approx_percentile(
                "value", F.array(*[F.lit(p) for p in probs]), F.lit(10000)
            ).alias("q")
        )
        .collect()
    }
    assert set(exact) == set(approx)
    for et, (elo, ehi) in exact.items():
        for i, av in enumerate(approx[et]):
            # the approximate quantile must land inside the exact
            # [p-eps, p+eps] rank band — the guarantee the sketch makes
            assert elo[i] <= av <= ehi[i], (et, probs[i], elo[i], av, ehi[i])
