"""stratified_sample: determinism, cap behavior, partition invariance."""

import pytest
from pyspark.sql import functions as F

from prom_spark.operators.sampling import stratified_sample


@pytest.fixture(scope="module")
def skewed(spark):
    # stratum sizes 2000 / 500 / 30: big ones sampled, small kept whole
    rows = (
        [(i, "big") for i in range(2000)]
        + [(10_000 + i, "mid") for i in range(500)]
        + [(20_000 + i, "tiny") for i in range(30)]
    )
    return spark.createDataFrame(rows, "id long, grp string")


def test_sample_sizes_near_cap(spark, skewed):
    out = stratified_sample(skewed, ["grp"], "id", cap=100)
    sizes = {r.grp: r.n for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    # small stratum untouched
    assert sizes["tiny"] == 30
    # Binomial(n, cap/n) concentrates around cap: 4-sigma bounds
    for g in ("big", "mid"):
        assert 60 <= sizes[g] <= 140, (g, sizes[g])


def test_sample_deterministic_and_partition_invariant(spark, skewed):
    a = {r.id for r in stratified_sample(skewed, ["grp"], "id", cap=100).collect()}
    b = {
        r.id
        for r in stratified_sample(
            skewed.repartition(13, "id"), ["grp"], "id", cap=100
        ).collect()
    }
    assert a == b  # pure function of (data, strata, cap) — not of layout


def test_sample_is_subset_and_cap_monotone(spark, skewed):
    s50 = {r.id for r in stratified_sample(skewed, ["grp"], "id", cap=50).collect()}
    s100 = {r.id for r in stratified_sample(skewed, ["grp"], "id", cap=100).collect()}
    # threshold sampling nests: raising the cap only ADDS rows
    assert s50 <= s100
    all_ids = {r.id for r in skewed.collect()}
    assert s100 <= all_ids


def test_cap_validation(spark, skewed):
    with pytest.raises(ValueError, match="cap"):
        stratified_sample(skewed, ["grp"], "id", cap=0)


def test_null_stratum_sampled_as_group(spark):
    # 300 rows with lang=NULL, 40 with lang='en'; the NULL stratum must
    # survive the re-join and be downsampled toward the cap like any
    # other stratum (a plain equi-join would silently drop all of it)
    rows = [(i, None) for i in range(300)] + [(1000 + i, "en") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(df, ["lang"], "doc_id", cap=50).collect()
    n_null = sum(1 for r in out if r.lang is None)
    n_en = sum(1 for r in out if r.lang == "en")
    assert n_en == 40  # under cap: kept whole
    assert 0 < n_null < 300  # sampled, not dropped, not kept whole
    assert abs(n_null - 50) <= 30  # Binomial(300, 1/6) concentration
