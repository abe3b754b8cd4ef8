"""Deterministic hash embeddings + cosine-ensemble scoring columns.

The north-star entity-link scoring is a "string-similarity +
embedding-cosine ensemble" (the reference's analogue is its
WordNet-semantic + Levenshtein rating mix). Real text embeddings are out
of scope in this container, so embeddings are deterministic md5-derived
unit vectors: every dimension takes two hex chars of ``md5(text || ':' ||
i)``'s digest (8 bits), centered and L2-normalized. The same value is
computable in DuckDB SQL, which keeps every embedding-based operator
oracle-checkable.

Properties that matter for the pipeline: identical strings -> cosine 1.0;
distinct strings -> pseudo-random cosine near 0 (expected |cos| ~ 1/4 at
dim 16); fully reproducible across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX = "0123456789abcdef"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def hash_embedding(col: Column | str, dim: int = 16) -> Column:
    """Unit-norm array<double> embedding of a string column.

    dim <= 16 uses a single md5 digest (2 hex chars per dimension).
    """
    assert 1 <= dim <= 16, "single-digest embedding supports dim <= 16"
    h = F.md5(_c(col))
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            (F.instr(F.lit(HEX), h.substr(2 * i + 1, F.lit(1))) - 1) * 16
            + (F.instr(F.lit(HEX), h.substr(2 * i + 2, F.lit(1))) - 1)
        ).cast("double")
            / 255.0
        - 0.5,
    )
    norm = F.sqrt(F.aggregate(raw, F.lit(0.0), lambda a, x: a + x * x))
    return F.transform(raw, lambda x: x / norm)


def hash_embedding_sql(expr: str, dim: int = 16) -> str:
    """DuckDB SQL string computing the identical embedding (oracle twin)."""
    comps = ", ".join(
        f"((strpos('{HEX}', substr(md5({expr}), {2*i+1}, 1)) - 1) * 16 + "
        f"(strpos('{HEX}', substr(md5({expr}), {2*i+2}, 1)) - 1)) / 255.0 - 0.5"
        for i in range(dim)
    )
    vec = f"[{comps}]"
    norm = f"sqrt(list_sum(list_transform({vec}, x -> x * x)))"
    return f"list_transform({vec}, x -> x / {norm})"
