"""Salted-join equivalence: detected vs supplied hot keys."""

from __future__ import annotations

from prom_spark.operators.salted_join import salted_join


def _frames(spark):
    big = spark.createDataFrame(
        [("hot", i) for i in range(200)] + [("cold%d" % i, i) for i in range(20)],
        "k string, v int",
    )
    small = spark.createDataFrame(
        [("hot", "H"), ("cold3", "C3"), ("cold7", "C7")], "k string, payload string"
    )
    return big, small


def _key_set(df):
    return sorted((r.k, r.v, r.payload) for r in df.collect())


def test_salted_join_matches_plain_join(spark):
    big, small = _frames(spark)
    plain = _key_set(big.join(small, on="k"))
    detected = _key_set(salted_join(big, small, key="k", n_salts=4))
    assert detected == plain


def test_salted_join_hot_keys_supplied(spark):
    big, small = _frames(spark)
    plain = _key_set(big.join(small, on="k"))
    via_list = _key_set(
        salted_join(big, small, key="k", n_salts=4, hot_keys=["hot"])
    )
    assert via_list == plain
    hot_df = spark.createDataFrame([("hot",)], "k string")
    via_df = _key_set(salted_join(big, small, key="k", n_salts=4, hot_keys=hot_df))
    assert via_df == plain


def test_salted_join_hot_keys_skips_count_pass(spark):
    """With hot_keys supplied the plan must not aggregate the big side."""
    big, small = _frames(spark)
    plan = salted_join(
        big, small, key="k", n_salts=4, hot_keys=["hot"]
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "count(1)" not in plan


def test_salted_join_empty_hot_keys(spark):
    """An empty hot-key list is a legitimate 'detection found nothing':
    everything takes the zero-salt plain path, output unchanged."""
    big, small = _frames(spark)
    plain = _key_set(big.join(small, on="k"))
    assert _key_set(salted_join(big, small, key="k", n_salts=4, hot_keys=[])) == plain


def test_salted_join_left_semi(spark):
    """how='left_semi' keeps big's columns only, each row at most once —
    the salted semi-reduction path for beyond-broadcast alias sets."""
    big, small = _frames(spark)
    plain = sorted((r.k, r.v) for r in big.join(small, on="k", how="left_semi").collect())
    got = sorted(
        (r.k, r.v)
        for r in salted_join(
            big, small, key="k", n_salts=4, hot_keys=["hot"], how="left_semi"
        ).collect()
    )
    assert got == plain


def test_salted_join_sampled_detection(spark):
    """Sampled hot-key detection changes only the salting choice, never
    the join output."""
    big, small = _frames(spark)
    plain = _key_set(big.join(small, on="k"))
    sampled = _key_set(
        salted_join(big, small, key="k", n_salts=4, detect_sample_fraction=0.3)
    )
    assert sampled == plain
