"""asof_join / range_join vs independent brute-force oracles."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from prom_spark.operators.temporal import asof_join, range_join

T0 = datetime(2024, 1, 1)


def _ts(sec):
    return T0 + timedelta(seconds=sec)


@pytest.fixture(scope="module")
def sides(spark):
    # deterministic pseudo-random-ish fixture, several keys, an
    # exactly-equal timestamp (inclusive-match check), keys missing
    # from either side
    left = spark.createDataFrame(
        [
            (k, _ts(s), f"L{k}_{s}")
            for k in (1, 2, 3, 9)
            for s in ((k * 7) % 13, 20 + k, 45, 100 + 3 * k)
        ],
        "k int, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [
            (k, _ts(s), s * 10 + k)
            for k in (1, 2, 3, 8)
            for s in (5, 20 + k, 60)  # 20+k collides exactly with a left ts
        ],
        "k int, rts timestamp, rv int",
    )
    return left, right


def _brute_asof(left_rows, right_rows, direction="backward", tol=None):
    out = {}
    for lr in left_rows:
        if direction == "backward":
            cands = [r for r in right_rows if r.k == lr.k and r.rts <= lr.ts]
            best = max(cands, key=lambda r: r.rts) if cands else None
        else:
            cands = [r for r in right_rows if r.k == lr.k and r.rts >= lr.ts]
            best = min(cands, key=lambda r: r.rts) if cands else None
        if best is not None and tol is not None:
            if abs((lr.ts - best.rts).total_seconds()) > tol:
                best = None
        out[(lr.k, lr.ts, lr.lv)] = (
            (best.rts, best.rv) if best is not None else (None, None)
        )
    return out


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_brute_force(spark, sides, direction):
    left, right = sides
    got = {
        (r.k, r.ts, r.lv): (r.rts, r.rv)
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            direction=direction,
        ).collect()
    }
    want = _brute_asof(left.collect(), right.collect(), direction)
    assert got == want
    # row count preserved (left-outer semantics) and some rows matched,
    # some not — otherwise the fixture tests nothing
    assert len(got) == left.count()
    assert any(v[0] is None for v in got.values())
    assert any(v[0] is not None for v in got.values())


def test_asof_equal_timestamp_is_inclusive(spark, sides):
    left, right = sides
    got = {
        (r.k, r.ts): r.rts
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts"
        ).collect()
    }
    for k in (1, 2, 3):  # left ts 20+k has a right row at exactly 20+k
        assert got[(k, _ts(20 + k))] == _ts(20 + k)


def test_asof_tolerance(spark, sides):
    left, right = sides
    tol = 10.0
    got = {
        (r.k, r.ts, r.lv): (r.rts, r.rv)
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            tolerance_sec=tol,
        ).collect()
    }
    want = _brute_asof(left.collect(), right.collect(), "backward", tol)
    assert got == want
    no_tol = _brute_asof(left.collect(), right.collect(), "backward")
    assert got != no_tol  # the tolerance must null out at least one match


def test_asof_empty_right(spark, sides):
    left, right = sides
    out = asof_join(
        left, right.filter(F.lit(False)), on="k", left_ts="ts",
        right_ts="rts",
    ).collect()
    assert len(out) == left.count()
    assert all(r.rts is None and r.rv is None for r in out)


def test_asof_struct_carry_keeps_rows_atomic(spark):
    """All matched right fields must come from the SAME right row: a
    column-wise last(ignorenulls) would stitch x from one row and y
    from another when the later row has a null field."""
    left = spark.createDataFrame([(1, _ts(30))], "k int, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(10), None, 11), (1, _ts(20), 22, None)],
        "k int, rts timestamp, x int, y int",
    )
    [row] = asof_join(left, right, on="k", left_ts="ts", right_ts="rts").collect()
    assert (row.rts, row.x, row.y) == (_ts(20), 22, None)


def test_asof_column_collision_raises(spark, sides):
    left, right = sides
    with pytest.raises(ValueError, match="collision"):
        asof_join(
            left.withColumnRenamed("lv", "rv"), right, on="k",
            left_ts="ts", right_ts="rts",
        )


@pytest.fixture(scope="module")
def pts_ivs(spark):
    pts = spark.createDataFrame(
        [(i, _ts(i * 37)) for i in range(80)], "pid int, ts timestamp"
    )
    ivs = spark.createDataFrame(
        [
            # spans several 60s buckets; zero-length; exact boundaries
            (0, _ts(0), _ts(250)),
            (1, _ts(100), _ts(100)),     # empty half-open interval
            (2, _ts(37), _ts(74)),       # point 1 at start (in), 2 at end (out)
            (3, _ts(1000), _ts(3000)),
            (4, _ts(2500), _ts(2600)),   # overlaps interval 3
        ],
        "wid int, start timestamp, end timestamp",
    )
    return pts, ivs


@pytest.mark.parametrize("width", [60, 600])
def test_range_join_matches_inequality_join(spark, pts_ivs, width):
    pts, ivs = pts_ivs
    got = {
        (r.pid, r.wid)
        for r in range_join(
            pts, ivs, point_ts="ts", start_col="start", end_col="end",
            bucket_width_sec=width,
        ).collect()
    }
    want = {
        (r.pid, r.wid)
        for r in pts.crossJoin(ivs)
        .filter((F.col("ts") >= F.col("start")) & (F.col("ts") < F.col("end")))
        .collect()
    }
    assert got == want and len(got) > 0
    assert (1, 2) in got and (2, 2) not in got  # half-open boundaries
    assert not any(w == 1 for _, w in got)      # empty interval matches nothing
    # a point inside two overlapping intervals appears once per interval
    assert sum(1 for p, _ in got if p == 68) == 2  # ts=2516 in wid 3 and 4


def test_range_join_no_duplicate_pairs(spark, pts_ivs):
    pts, ivs = pts_ivs
    out = range_join(pts, ivs, bucket_width_sec=60, point_ts="ts")
    assert out.count() == out.select("pid", "wid").distinct().count()


def test_temporal_plan_shapes(spark, sides, pts_ivs):
    """The operators' scale contracts, pinned on the physical plan:
    asof_join is ONE exchange + window with NO join; range_join is a
    hash equi-join with NO cartesian/nested-loop stage."""
    left, right = sides
    p = (
        asof_join(left, right, on="k", left_ts="ts", right_ts="rts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert p.count("Exchange") == 1 and "Join" not in p and "Window" in p
    pts, ivs = pts_ivs
    p2 = (
        range_join(pts, ivs, point_ts="ts", bucket_width_sec=600)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Cartesian" not in p2 and "BroadcastNestedLoop" not in p2
    # any equi-join strategy qualifies (hash or sort-merge — Catalyst's
    # pick varies with stats); the contract is only "not a product"
    assert "HashJoin" in p2 or "SortMergeJoin" in p2
