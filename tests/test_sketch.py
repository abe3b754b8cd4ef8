"""count_min_sketch / cms_estimate vs exact counts + CMS guarantees."""

import pytest
from pyspark.sql import functions as F

from prom_spark.operators.sketch import cms_estimate, count_min_sketch

DEPTH, WIDTH = 4, 64


@pytest.fixture(scope="module")
def keyed(spark):
    # Zipf-ish: key j appears ~ 600/(j+1) times, 40 distinct keys
    rows = [(f"k{j}",) for j in range(40) for _ in range(600 // (j + 1))]
    return spark.createDataFrame(rows, "k string")


def test_cms_one_sided_and_bounded(spark, keyed):
    sketch = count_min_sketch(keyed, "k", depth=DEPTH, width=WIDTH)
    cells = sketch.collect()
    assert len(cells) <= DEPTH * WIDTH
    n_total = keyed.count()
    assert sum(c.cnt for c in cells) == DEPTH * n_total  # mass conserved
    est = {
        r.k: r.est
        for r in cms_estimate(sketch, keyed, "k", depth=DEPTH, width=WIDTH).collect()
    }
    true = {r.k: r.cnt for r in keyed.groupBy("k").count().withColumnRenamed("count", "cnt").collect()}
    assert set(est) == set(true)
    eps_n = (2.718 / WIDTH) * n_total
    for k, t in true.items():
        assert est[k] >= t  # never under-counts
        assert est[k] <= t + eps_n  # classic bound (deterministic here)
    # the sketch must actually be lossy at this width or the test is
    # vacuous
    assert any(est[k] > true[k] for k in true)


def test_cms_unseen_key_small_estimate(spark, keyed):
    sketch = count_min_sketch(keyed, "k", depth=DEPTH, width=WIDTH)
    probes = spark.createDataFrame([("never-seen",), ("k0",)], "k string")
    est = {
        r.k: r.est
        for r in cms_estimate(sketch, probes, "k", depth=DEPTH, width=WIDTH).collect()
    }
    # unseen keys only pick up collision mass — far below the top key
    assert est["never-seen"] < est["k0"]


def test_cms_deterministic(spark, keyed):
    a = sorted(map(tuple, count_min_sketch(keyed, "k", depth=DEPTH, width=WIDTH).collect()))
    b = sorted(map(tuple, count_min_sketch(keyed, "k", depth=DEPTH, width=WIDTH).collect()))
    assert a == b


def test_cms_width_cap(spark, keyed):
    with pytest.raises(ValueError, match="16-bit"):
        count_min_sketch(keyed, "k", width=1 << 17)


# ---- KMV distinct sketch ----


def test_kmv_estimate_within_bound(spark):
    # 3 groups with known cardinalities 2000 / 300 / 20
    rows = (
        [("g0", f"u{i}") for i in range(2000)]
        + [("g1", f"u{i}") for i in range(300)]
        + [("g2", f"u{i}") for i in range(20)]
    )
    df = spark.createDataFrame(rows * 2, "g string, k string")  # dup rows
    from prom_spark.operators.sketch import kmv_distinct

    out = {r.g: r for r in kmv_distinct(df, "k", ["g"], k=64).collect()}
    # small group: exact (fewer than k distinct hashes)
    assert out["g2"].n_k == 20 and out["g2"].est_distinct == 20.0
    # large groups: within ~5/sqrt(k) relative error (generous, but the
    # estimator is deterministic here so this is a regression pin too)
    for g, true in (("g0", 2000), ("g1", 300)):
        est = out[g].est_distinct
        assert abs(est - true) / true < 5 / (64 ** 0.5), (g, est)


def test_kmv_salted_path_equals_plain_topk(spark):
    # the salted two-stage top-k must equal a single global top-k
    rows = [("g", f"v{i}") for i in range(5000)]
    df = spark.createDataFrame(rows, "g string, k string")
    from prom_spark.operators.sketch import kmv_distinct

    a = kmv_distinct(df, "k", ["g"], k=32, n_salts=64).collect()[0]
    b = kmv_distinct(df, "k", ["g"], k=32, n_salts=1).collect()[0]
    assert (a.kth_hash, a.n_k, a.est_distinct) == (b.kth_hash, b.n_k, b.est_distinct)


def test_kmv_validation(spark):
    from prom_spark.operators.sketch import kmv_distinct

    df = spark.createDataFrame([("g", "a")], "g string, k string")
    with pytest.raises(ValueError, match="k must be"):
        kmv_distinct(df, "k", ["g"], k=1)


# ---- Bloom filter ----


def test_bloom_no_false_negatives_some_false_positives(spark):
    from prom_spark.operators.sketch import bloom_bits, bloom_passing_keys

    members = spark.createDataFrame([(i,) for i in range(0, 400)], "k long")
    probes = spark.createDataFrame([(i,) for i in range(0, 4000)], "k long")
    bits = bloom_bits(members, "k", m=2048, k=3)
    assert bits.count() <= 2048
    passing = {r.k for r in bloom_passing_keys(bits, probes, "k", m=2048, k=3).collect()}
    # every true member passes
    assert set(range(400)) <= passing
    # lossy but useful: some false positives, far fewer than non-members
    fp = passing - set(range(400))
    assert 0 < len(fp) < 3600 * 0.25, len(fp)


def test_bloom_deterministic(spark):
    from prom_spark.operators.sketch import bloom_bits

    members = spark.createDataFrame([(i,) for i in range(100)], "k long")
    a = {r.pos for r in bloom_bits(members, "k").collect()}
    b = {r.pos for r in bloom_bits(members.repartition(7), "k").collect()}
    assert a == b
