"""Temporal joins the DataFrame API lacks, as shuffle-lean compositions.

Two operators a transcript/event pipeline needs constantly and Spark has
no built-in for:

- ``asof_join`` — for each left row, the single most recent right row
  (per key) at or before the left timestamp. The classic executions are
  a per-row point lookup (driver loop — not distributed) or a
  range-condition join (Catalyst plans O(n·m) per key). Here it is ONE
  shuffle: union both sides, one per-key window sorted by time, and a
  carry-forward of the last right payload — O((n+m) log(n+m)) per key,
  no join at all.

- ``range_join`` — points joined to the intervals containing them. A
  plain inequality join degenerates to a per-key cross product; the
  scale path is bucketing: intervals explode to the fixed-width time
  buckets they span, points map to exactly one bucket, and the match is
  an equi-join on bucket plus an exact containment filter. Replication
  is bounded by interval_length / bucket_width, and each matching pair
  is produced exactly once (a point has one bucket), so no dedup pass.

No reference analogue (the reference is not a temporal engine) — these
are the training-data-pipeline extras for event/transcript alignment,
oracle-gated as q38 (DuckDB ``ASOF LEFT JOIN`` twin) and q39 (plain
inequality-join twin).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join"]


def _us(col: Column | str) -> Column:
    """Epoch microseconds; tolerates TIMESTAMP_NTZ inputs (parquet
    scans default to NTZ), interpreting naive values in the session
    timezone — UTC in this engine's harnesses, matching DuckDB's
    ``epoch_us`` over naive timestamps."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance_sec: float | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, matched to the most recent
    ``right`` row for the same ``on`` key with ``right_ts <= left_ts``
    (``direction="backward"``; ``"forward"`` matches the EARLIEST right
    row with ``right_ts >= left_ts``). Unmatched left rows keep nulls
    in the right columns, like a left outer join.

    Plan shape: both sides are projected to (key, ts, payload-struct),
    unioned, and scanned by ONE per-key window sorted by
    (ts, side-tag) — right rows sort before left rows at equal
    timestamps, so an exactly-equal timestamp matches (inclusive, the
    same rule as DuckDB/pandas as-of). The matched payload rides a
    single ``last(struct, ignorenulls)`` carry, so all right columns
    come from the SAME right row even when some of its fields are null
    (a column-wise carry would stitch fields from different rows).

    At 100 TB this is one hash exchange on ``on`` plus a per-partition
    sort — the same cost class as any keyed aggregation. A Zipf-hot key
    serializes inside one task (carry-forward needs the key's full
    timeline); if a key is both hot and long-tailed, pre-split it by
    coarse time range and stitch the boundary with a per-range seed row
    — the operator keeps the simple contract and documents the trade.

    Ties among right rows with identical (key, ts) are broken by the
    later row in the union's sort, which is not deterministic unless
    (key, right_ts) is unique — callers wanting hash-stable output on
    duplicated timestamps should pre-dedup the right side.

    ``tolerance_sec``: optional max age (seconds) of the match —
    matches further than this from the left timestamp null out, like
    pandas ``merge_asof(tolerance=...)``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    right_cols = [c for c in right.columns if c != on]
    if not right_cols:
        raise ValueError("asof_join: right side has no payload columns")
    overlap = set(right_cols) & {c for c in left.columns if c != on}
    if overlap:
        raise ValueError(
            f"asof_join: column collision {sorted(overlap)} — rename "
            "the right side's columns before joining"
        )
    left_cols = [c for c in left.columns if c != on]

    # right rows tag 0, left rows tag 1: at equal ts the right row
    # precedes the left row in the window order, so it is visible to
    # the carry (inclusive match) in BOTH directions.
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_payload"),
        *[F.lit(None).alias(f"_l_{c}") for c in left_cols],
    )
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c).alias(f"_l_{c}") for c in left_cols],
    )
    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy(on)
        .orderBy(ts_order, F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r)
        .withColumn("_m", F.last("_payload", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
    )
    if tolerance_sec is not None:
        age = F.abs(_us("_ts") - _us(f"_m.{right_ts}")) / F.lit(1e6)
        matched = matched.withColumn(
            "_m", F.when(age <= F.lit(tolerance_sec), F.col("_m"))
        )
    return matched.select(
        F.col(on),
        *[F.col(f"_l_{c}").alias(c) for c in left_cols],
        *[F.col(f"_m.{c}").alias(c) for c in right_cols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_width_sec: int = 3600,
) -> DataFrame:
    """Join points to the intervals containing them (half-open:
    ``start <= ts < end``) via fixed-width time bucketing.

    Intervals explode to every ``bucket_width_sec`` bucket they touch;
    points land in exactly one bucket; an equi-join on bucket plus the
    exact containment filter yields each (point, interval) match
    exactly once — no cross product, no dedup. Interval replication is
    ``len/width + 1`` rows: size ``bucket_width_sec`` near the typical
    interval length to keep the exploded side within a small constant
    of its input. Hot buckets distribute like any skewed equi-join key
    (the salted-join pattern applies unchanged if a single time window
    dominates).

    Columns from both inputs are preserved; name collisions must be
    resolved by the caller (checked).
    """
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(
            f"range_join: column collision {sorted(overlap)} — rename "
            "before joining"
        )
    width = F.lit(int(bucket_width_sec) * 1_000_000)  # microseconds
    p = points.withColumn("_rb", F.floor(_us(point_ts) / width))
    i = intervals.withColumn(
        "_rb",
        F.explode(
            F.sequence(
                F.floor(_us(start_col) / width),
                F.floor(_us(end_col) / width),
            )
        ),
    )
    return (
        p.join(i, on="_rb")
        .filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) < F.col(end_col))
        )
        .drop("_rb")
    )
