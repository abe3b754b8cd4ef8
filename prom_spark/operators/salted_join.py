"""Skew-aware (salted) equi-join.

north_rule requires explicit skew salting on hot entities: mention
frequencies are Zipf by construction, so the mention ⋈ alias-dictionary
join has a few keys carrying a large share of rows. AQE's skew-join
splitting only helps sort-merge joins mid-shuffle; for a replicated
dictionary side the classic fix is:

  - big (skewed) side: add salt = pmod(xxhash64(row-unique cols), S)
  - small side: explode each row into S copies, one per salt value
  - equi-join on (key, salt)

Hot-key detection is adaptive: keys whose count exceeds ``hot_factor``
times the mean key count get salted; the cold majority joins with salt 0
so the dictionary side is NOT replicated for them (replication cost only
where it pays).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    hot_factor: float = 10.0,
    how: str = "inner",
    hot_keys: list | DataFrame | None = None,
    detect_sample_fraction: float | None = None,
) -> DataFrame:
    """Join ``big ⋈ small on key`` with salting on detected hot keys.

    Returns columns of both inputs (key once). Hot keys come from
    ``hot_keys`` when supplied (a list of key values or a one-column
    DataFrame) — the right call at 10^12 rows where the hot set is known
    a priori (e.g. the dictionary's most-aliased entities); otherwise
    they are detected with a count pass over ``big``. With
    ``detect_sample_fraction`` the detection counts a deterministic
    sample instead of the full table: hot keys are by definition the
    keys a small sample still sees many times, so a 2-5% sample finds
    them while cutting the extra pass's scan+shuffle by 20-50x (the
    mean-count threshold is scale-free — both sides shrink by the same
    fraction).
    """
    if hot_keys is not None:
        if isinstance(hot_keys, DataFrame):
            hot = hot_keys.select(
                F.col(hot_keys.columns[0]).alias(key), F.lit(True).alias("_hot")
            ).distinct()
        elif hot_keys:
            hot = (
                big.sparkSession.createDataFrame([(k,) for k in hot_keys], [key])
                .withColumn("_hot", F.lit(True))
                .distinct()
            )
        else:
            # an empty list is a legitimate "detection found nothing":
            # build the empty hot frame with an explicit schema
            # (createDataFrame cannot infer one from an empty dataset),
            # which makes every row take the zero-salt plain-join path
            from pyspark.sql import types as T

            hot = big.sparkSession.createDataFrame(
                [],
                T.StructType(
                    [
                        T.StructField(key, big.schema[key].dataType),
                        T.StructField("_hot", T.BooleanType()),
                    ]
                ),
            )
    else:
        src = (
            big.sample(fraction=detect_sample_fraction, seed=7)
            if detect_sample_fraction
            else big
        )
        counts = src.groupBy(key).agg(F.count("*").alias("_cnt"))
        stats = counts.agg(F.avg("_cnt").alias("_mean")).collect()[0]
        mean = stats._mean or 1.0
        hot = counts.filter(F.col("_cnt") > hot_factor * mean).select(
            key, F.lit(True).alias("_hot")
        )

    big_s = (
        big.join(F.broadcast(hot), on=key, how="left")
        .withColumn(
            "_salt",
            F.when(
                F.col("_hot"),
                F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)),
            ).otherwise(F.lit(0)).cast("int"),
        )
        .drop("_hot")
    )
    small_s = (
        small.join(F.broadcast(hot), on=key, how="left")
        .withColumn(
            "_salts",
            F.when(F.col("_hot"), F.sequence(F.lit(0), F.lit(n_salts - 1))).otherwise(
                F.array(F.lit(0))
            ),
        )
        .withColumn("_salt", F.explode("_salts"))
        .drop("_salts", "_hot")
    )
    return big_s.join(small_s, on=[key, "_salt"], how=how).drop("_salt")
