"""time_rollup: re-aggregation equivalence + single-scan plan pin."""

from datetime import datetime, timedelta
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from prom_spark.operators.rollup import time_rollup


@pytest.fixture(scope="module")
def events(spark):
    t0 = datetime(2024, 3, 1)
    rows = [
        (
            i,
            t0 + timedelta(seconds=(i * 137) % 200_000),
            ("a", "b", "c")[i % 3],
            round((i * 7.31) % 50, 2),
        )
        for i in range(500)
    ]
    return spark.createDataFrame(
        rows, "event_id int, ts timestamp, kind string, value double"
    )


def test_rollup_equals_direct_aggregation(spark, events):
    """Every coarser level (computed by re-aggregating the finer one)
    must equal a direct aggregation of the raw rows at that
    resolution."""
    out = time_rollup(
        events, ts_col="ts", dims=["kind"], value_col="value",
        resolutions_sec=[60, 3600, 86400],
    )
    got = {
        (r.resolution_sec, r.bucket_start, r.kind): (
            r.n, r.sum_value, r.min_value, r.max_value,
        )
        for r in out.collect()
    }
    for res in (60, 3600, 86400):
        direct = (
            events.groupBy(
                (
                    F.floor(
                        F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000)
                        / res
                    )
                    * res
                ).cast("long").alias("b"),
                "kind",
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(27,6)")).alias("s"),
                F.min("value").alias("mn"),
                F.max("value").alias("mx"),
            )
            .collect()
        )
        for r in direct:
            n, s, mn, mx = got[(res, r.b, r.kind)]
            assert (n, mn, mx) == (r.n, r.mn, r.mx)
            assert Decimal(s) == Decimal(r.s)
        assert len(direct) == sum(1 for k in got if k[0] == res)
    # totals conserved across every level
    n_levels = {res: sum(v[0] for k, v in got.items() if k[0] == res)
                for res in (60, 3600, 86400)}
    assert set(n_levels.values()) == {events.count()}


def test_rollup_plan_reuses_finest(spark, events):
    """The raw table must be scanned/shuffled ONCE: coarser levels
    consume the finest aggregate through a ReusedExchange, not a second
    scan of the input."""
    out = time_rollup(events, dims=["kind"], resolutions_sec=[60, 3600, 86400])
    out.collect()  # AQE surfaces exchange reuse in the FINAL plan only
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in p and "ReusedExchange" in p


def test_rollup_validation(spark, events):
    with pytest.raises(ValueError, match="ascending"):
        time_rollup(events, resolutions_sec=[3600, 60])
    with pytest.raises(ValueError, match="multiple"):
        time_rollup(events, resolutions_sec=[60, 90])
    with pytest.raises(ValueError, match="bad resolutions"):
        time_rollup(events, resolutions_sec=[])
