"""Count-min sketch: fixed-size frequency summary + heavy hitters.

The streaming-agg workhorse for corpus statistics at 100 TB: the sketch
is a ``depth × width`` grid of counters — kilobytes, independent of
corpus size or key cardinality. Build is ONE map-side-combinable
aggregation (each row explodes to ``depth`` (row, bucket) cells; partial
aggregation collapses them to at most ``depth × width`` cells per task
before the shuffle, so shuffle volume is bounded by the sketch size
times the task count, not by the data). Point estimates are a broadcast
join of the tiny sketch against any candidate key set;
``cms_estimate`` over the distinct keys gives heavy hitters.

Estimates are the classic one-sided bound: ``est >= true`` always,
``est <= true + εN`` with probability 1-δ for ``width = e/ε``,
``depth = ln(1/δ)``.

Hash functions are md5-derived with the row index baked into the
preimage — deterministic and engine-portable, so the whole sketch (and
every estimate) is bit-reproducible in the DuckDB oracle (q41) via the
same nibble arithmetic the SimHash twin uses. No reference analogue;
training-data-pipeline extra.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bloom_bits",
    "bloom_passing_keys",
    "cms_estimate",
    "count_min_sketch",
    "kmv_distinct",
]


def _bucket(key: Column, i: int, width: int) -> Column:
    """Hash row ``i``: first 4 hex chars (16 bits) of
    md5('<i>:'||key), mod width. 16 bits bound ``width`` at 65536."""
    if width > 1 << 16:
        raise ValueError(f"cms: width {width} exceeds the 16-bit hash space")
    h = F.md5(F.concat(F.lit(f"{i}:"), key))
    return (
        F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % F.lit(width)
    ).cast("int")


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build the sketch: one row per NON-EMPTY cell —
    ``(row int, bucket int, cnt long)``. At most ``depth × width`` rows
    regardless of input size."""
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("row"),
                        _bucket(F.col(key_col), i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c")
    )
    return (
        cells.groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-estimate every key in ``keys`` (any DataFrame with
    ``key_col``): est = min over rows of the key's cell. The sketch is
    broadcast (it is at most depth × width rows by construction); cells
    never touched by any key count as 0. ``depth``/``width`` must match
    the build — they determine the hash family."""
    probes = keys.select(key_col).distinct()
    lookups = probes.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("row"),
                        _bucket(F.col(key_col), i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
    return (
        lookups.join(F.broadcast(sketch), on=["row", "bucket"], how="left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


_KMV_SPACE = 1 << 48


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 64,
    n_salts: int = 64,
    seed: str = "kmv",
) -> DataFrame:
    """K-minimum-values distinct-count sketch per group: the classic
    mergeable cardinality estimator — track the k smallest 48-bit
    hashes of the distinct keys; if the k-th smallest is ``h`` then the
    distinct count is ~ (k-1) * 2^48 / h (relative error ~ 1/sqrt(k)).

    Returns ``(group_cols..., kth_hash long, n_k int, est_distinct
    double)``; groups with fewer than k distinct keys report the exact
    count (``n_k < k``, est = n_k).

    Plan shape (the 100 TB concern is the per-group top-k): the
    distinct pass is one map-side-combinable shuffle; the top-k is
    SALTED two-stage — k smallest within each of ``n_salts`` hash-salt
    sub-partitions of a group (parallel, bounded sorts), then k
    smallest of the <= k * n_salts survivors per group. No group is
    ever sorted in a single task, so a hot group (one event_type owning
    most of the corpus) cannot straggle the stage.

    Hashing is md5-derived and engine-portable (q45's DuckDB twin
    recomputes the identical sketch via nibble arithmetic); estimates
    are therefore bit-reproducible, not just statistically comparable.
    """
    if k < 2:
        raise ValueError(f"kmv_distinct: k must be >= 2, got {k}")
    groups = [F.col(c) for c in group_cols]
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    from pyspark.sql import Window

    hashes = df.select(*groups, h.alias("_h")).distinct()
    w1 = Window.partitionBy(*group_cols, F.col("_h") % n_salts).orderBy("_h")
    w2 = Window.partitionBy(*group_cols).orderBy("_h")
    topk = (
        hashes.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= k)
    )
    return topk.groupBy(*group_cols).agg(
        F.max("_h").alias("kth_hash"),
        F.count(F.lit(1)).cast("int").alias("n_k"),
        F.round(
            F.when(F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double"))
            .otherwise(F.lit(float(k - 1) * _KMV_SPACE) / F.max("_h")),
            6,
        ).alias("est_distinct"),
    )


def _bloom_pos(key: Column, i: int, m: int, seed: str) -> Column:
    """Hash ``i`` of the Bloom family: 16-bit md5 prefix mod m."""
    if m > 1 << 16:
        raise ValueError(f"bloom: m {m} exceeds the 16-bit hash space")
    h = F.md5(F.concat(F.lit(f"{seed}{i}:"), key.cast("string")))
    return (
        F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % F.lit(m)
    ).cast("int")


def _bloom_positions(df: DataFrame, key_col: str, m: int, k: int, seed: str) -> DataFrame:
    return df.select(
        F.col(key_col),
        F.explode(
            F.array(*[_bloom_pos(F.col(key_col), i, m, seed) for i in range(k)])
        ).alias("pos"),
    )


def bloom_bits(
    df: DataFrame, key_col: str, m: int = 4096, k: int = 3, seed: str = "bf"
) -> DataFrame:
    """Build a Bloom filter over ``df[key_col]`` as a DataFrame of set
    bit positions ``(pos int)`` — at most ``min(k * |keys|, m)`` rows,
    broadcastable by construction. One aggregation, map-side
    combinable (distinct over <= m values)."""
    return _bloom_positions(df, key_col, m, k, seed).select("pos").distinct()


def bloom_passing_keys(
    bits: DataFrame,
    probes: DataFrame,
    key_col: str,
    m: int = 4096,
    k: int = 3,
    seed: str = "bf",
) -> DataFrame:
    """Keys of ``probes`` that PASS the filter (all ``k`` positions
    set): the runtime-filter/semi-join-reduction pattern — broadcast
    the tiny bit table against the probe stream, keep keys whose hit
    count is ``k``. No false negatives; false positives at the
    standard (1 - e^(-kn/m))^k rate, deterministic given the data.
    ``m``/``k``/``seed`` must match the build."""
    hits = (
        _bloom_positions(probes.select(key_col).distinct(), key_col, m, k, seed)
        .join(F.broadcast(bits), on="pos")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("_hits"))
    )
    return hits.filter(F.col("_hits") == k).select(key_col)
