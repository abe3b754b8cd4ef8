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

__all__ = ["count_min_sketch", "cms_estimate"]


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
