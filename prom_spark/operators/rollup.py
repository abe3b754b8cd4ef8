"""Hypertable-style multi-resolution time rollup (continuous aggregate).

The TimescaleDB/Druid pattern: an event stream aggregated at a ladder of
time resolutions (1 min → 1 h → 1 d). The naive plan scans the raw table
once PER resolution; at 100 TB that is the whole job multiplied by the
ladder depth. The scale path is algebraic re-aggregation: only the
FINEST level touches raw rows; every coarser level aggregates the finer
aggregate (sum of sums, min of mins, count of counts — avg is carried
decomposed as sum+count), whose row count is bounded by buckets × dims,
not by the corpus. Physically the finest level's shuffle is planned once
and reused across the union's branches (Spark ``ReusedExchange`` —
pinned by ``tests/test_rollup.py::test_rollup_plan_reuses_finest``), so
raw data is scanned and shuffled exactly once.

Sums run over ``decimal(27, 6)``: decimal addition is associative, so
partial aggregation order (Spark) vs sequential order (the DuckDB
oracle) cannot produce last-ulp float drift — same trade the q20 twin
makes. No reference analogue; training-data-pipeline extra, oracle-gated
as q40 (per-resolution GROUP BYs recomputed from raw in SQL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["time_rollup"]


def time_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    dims: list[str] | None = None,
    value_col: str = "value",
    resolutions_sec: list[int] = (60, 3600, 86400),
) -> DataFrame:
    """Aggregate ``df`` at every resolution in ``resolutions_sec``
    (ascending; each must divide the next, so coarser buckets are exact
    unions of finer ones and re-aggregation is lossless).

    Output, one row per non-empty (resolution, bucket, dims):
    ``resolution_sec``, ``bucket_start`` (epoch seconds), ``dims...``,
    ``n`` (count), ``sum_value`` (decimal), ``min_value``,
    ``max_value``.
    """
    res = [int(r) for r in resolutions_sec]
    if not res or any(r <= 0 for r in res):
        raise ValueError(f"time_rollup: bad resolutions {res}")
    if sorted(res) != res or len(set(res)) != len(res):
        raise ValueError(f"time_rollup: resolutions must be ascending: {res}")
    for a, b in zip(res, res[1:]):
        if b % a != 0:
            raise ValueError(
                f"time_rollup: {b} is not a multiple of {a} — coarser "
                "buckets must align exactly with finer ones"
            )
    dims = list(dims or [])

    def bucket(col: Column, r: int) -> Column:
        # epoch-second bucket start; NTZ-tolerant like temporal._us
        sec = F.floor(F.unix_micros(col.cast("timestamp")) / F.lit(1_000_000))
        return (F.floor(sec / F.lit(r)) * F.lit(r)).cast("long")

    finest = (
        df.groupBy(
            bucket(F.col(ts_col), res[0]).alias("bucket_start"), *dims
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("decimal(27,6)")).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )
    levels = [finest.withColumn("resolution_sec", F.lit(res[0]).cast("int"))]
    finer = finest
    for r in res[1:]:
        coarser = (
            finer.groupBy(
                (F.floor(F.col("bucket_start") / F.lit(r)) * F.lit(r))
                .cast("long")
                .alias("bucket_start"),
                *dims,
            )
            .agg(
                F.sum("n").alias("n"),
                F.sum("sum_value").alias("sum_value"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
            )
        )
        levels.append(coarser.withColumn("resolution_sec", F.lit(r).cast("int")))
        finer = coarser
    out = levels[0]
    for lvl in levels[1:]:
        out = out.unionByName(lvl)
    return out.select(
        "resolution_sec", "bucket_start", *dims, "n",
        "sum_value", "min_value", "max_value",
    )
