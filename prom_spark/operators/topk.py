"""Skew-safe per-group top-k.

The naive per-group top-k (``row_number() OVER (PARTITION BY group
ORDER BY key)``) puts each group in ONE task — a Zipf-hot group (a
stopword term, a dominant event type) serializes the stage at corpus
scale. This operator runs the standard salted two-stage refinement:
top-k within each of ``n_salts`` hash-salt sub-partitions of a group
(parallel, bounded sorts), then top-k of the <= k * n_salts survivors.
Results are exactly equal to the naive form (top-k is a semilattice:
the global top-k is contained in the union of sub-partition top-ks).

Used by the KMV sketch (operators/sketch.kmv_distinct inlines the same
shape) and the inverted-index posting-list query (q51).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["salted_topk"]


def salted_topk(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    k: int,
    n_salts: int = 64,
    descending: bool = False,
) -> DataFrame:
    """Rows of ``df`` whose ``order_col`` ranks in the group's top-k
    (ascending by default), with deterministic output independent of
    ``n_salts``. Ties beyond position k are broken BY ``order_col``
    VALUE ONLY — callers needing total determinism under duplicate
    order values should pass a de-duplicated or tie-broken column.
    """
    if k < 1:
        raise ValueError(f"salted_topk: k must be >= 1, got {k}")
    groups = list(group_cols)
    order = F.desc(order_col) if descending else F.asc(order_col)
    # salt on a hash of the ORDER column so equal-order duplicates land
    # in the same sub-partition and stage-1 pruning stays exact
    salt = F.abs(F.hash(F.col(order_col))) % n_salts
    w1 = Window.partitionBy(*groups, salt).orderBy(order)
    w2 = Window.partitionBy(*groups).orderBy(order)
    return (
        df.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= k)
        .drop("_r1", "_r2")
    )
