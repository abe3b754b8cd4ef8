"""Deterministic hash-based stratified sampling.

The training-data-balancing primitive at 100 TB: cap every stratum
(language, source, quality band, ...) at a target row count WITHOUT a
global sort, a random() call, or a second pass over the data. Each row
is kept iff a content hash of its id falls under the stratum's
acceptance threshold, so

- the sample is a pure function of (data, strata, cap) — re-running the
  job, re-partitioning the input, or resuming from checkpoint yields
  the SAME sample (random() would not survive any of those);
- the plan is one small aggregation (stratum counts, map-side
  combinable), one broadcast join of that tiny table back onto the
  stream, and one codegen filter — no shuffle of the data itself;
- the hash is md5-derived and engine-portable, so a DuckDB oracle
  reproduces the exact row set (q42).

The acceptance test is pure int64 arithmetic — ``h32 * n_stratum <
cap * 2^32`` with ``h32 < 2^32`` — no float rounding to drift between
engines, no overflow while ``n_stratum`` stays below ~2^31 rows per
stratum (raise ``hash_bits``' complement if a stratum ever exceeds
that; at 2^31 rows per stratum the count itself should be salted).

Sample size per stratum is Binomial(n, cap/n) — concentrated within
O(sqrt(cap)) of ``cap``, the standard hash-sampling trade for a
single-pass plan. Strata at or under the cap are kept whole.

No reference analogue (the reference never samples); this is a
training-data-pipeline extra per the build brief.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hash32", "stratified_sample"]

_HASH_SPACE = 1 << 32


def hash32(col: Column, seed: str = "") -> Column:
    """First 8 hex chars (32 bits) of md5('<seed>:' || col) as a long —
    deterministic, engine-portable (DuckDB twin: nibble arithmetic over
    the same md5 hex)."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def stratified_sample(
    df: DataFrame,
    strata_cols: Sequence[str],
    id_col: str,
    cap: int,
    seed: str = "s42",
) -> DataFrame:
    """Downsample ``df`` so every stratum (distinct ``strata_cols``
    combination) keeps ~``cap`` rows, deterministically by
    ``hash32(id_col)``. Strata with <= cap rows are kept whole. NULL
    stratum values form their own stratum (null-safe join), matching
    the groupBy's NULL handling.

    Plan: groupBy-count over strata (tiny output), broadcast join back,
    codegen filter. The data stream is never shuffled.
    """
    if cap <= 0:
        raise ValueError(f"stratified_sample: cap must be positive, got {cap}")
    strata = list(strata_cols)
    counts = df.groupBy(*strata).agg(F.count(F.lit(1)).alias("_stratum_n"))
    # null-safe re-join: a NULL stratum value (groupBy already counts it
    # as its own group) must rejoin its rows and be sampled as a group —
    # a plain equi-join would silently DROP every NULL-stratum row from
    # the sample (the failure mode is invisible: fewer rows, no error)
    renamed = counts.select(
        *[F.col(c).alias(f"_s_{c}") for c in strata], "_stratum_n"
    )
    cond = None
    for c in strata:
        e = F.col(c).eqNullSafe(F.col(f"_s_{c}"))
        cond = e if cond is None else cond & e
    h = hash32(F.col(id_col), seed=seed)
    return (
        df.join(F.broadcast(renamed), on=cond)
        .filter(
            (F.col("_stratum_n") <= F.lit(cap))
            | (h * F.col("_stratum_n") < F.lit(cap) * F.lit(_HASH_SPACE))
        )
        .drop("_stratum_n", *[f"_s_{c}" for c in strata])
    )
