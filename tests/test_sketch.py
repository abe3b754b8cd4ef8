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
