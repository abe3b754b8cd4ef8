"""Benchmark decontamination: n-gram overlap against a blocklist corpus.

The standard eval-hygiene pass of an LLM training-data pipeline: before
training, every document is scored for overlap with a (comparatively
tiny) set of benchmark/eval texts, and documents above an overlap
threshold are flagged or dropped — the GPT-3/PaLM-style n-gram
contamination check, as a Catalyst plan:

1. the BENCHMARK side is shingled into word n-grams and hashed (md5 —
   deterministic, engine-portable) into a DISTINCT blocklist. Benchmarks
   are bounded (thousands of documents, not billions), so the blocklist
   broadcast-fits by construction.
2. the CORPUS side is shingled the same way; each document's distinct
   shingle stream probes the broadcast blocklist — a broadcast LEFT
   SEMI-ish join realized as a hit count, no shuffle of corpus text,
   and one per-document aggregation (map-side combinable) computing the
   contaminated-shingle fraction.

At 100 TB this is one corpus scan + one grouped count keyed by the
document id; nothing corpus-sized crosses an exchange except the
(doc_id, n_shingles, n_hits) aggregate stream. No reference analogue;
training-data-pipeline extra per the build brief. Oracle-grade gate:
``tests/test_decontaminate.py`` recomputes the exact relation in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["contamination_scores", "shingle_blocklist"]


def _shingles(df: DataFrame, id_col: str, text_col: str, n: int):
    """Distinct word n-gram md5 hashes per row: (_id, sh)."""
    toks = F.filter(
        F.split(F.regexp_replace(F.lower(text_col), r"\s+", " "), " "),
        lambda t: t != "",
    )
    grams = F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.md5(
                    F.array_join(F.slice(toks, i, n), " ")
                ),
            )
        ),
    ).otherwise(F.array())
    # explode_OUTER: a document shorter than n tokens keeps one NULL
    # shingle row, so the per-document aggregation sees every document
    # and no corpus-sized restore join is needed downstream
    return df.select(
        F.col(id_col).alias("_id"), F.explode_outer(grams).alias("sh")
    )


def shingle_blocklist(
    benchmark: DataFrame, text_col: str, n: int = 8
) -> DataFrame:
    """DISTINCT word ``n``-gram hashes of the benchmark corpus — the
    broadcast side of the contamination probe. 8-gram is the
    conventional contamination window (long enough that shared n-grams
    imply copying, short enough to catch partial inclusion)."""
    b = benchmark.select(F.monotonically_increasing_id().alias("_bid"), text_col)
    return (
        _shingles(b, "_bid", text_col, n)
        .filter(F.col("sh").isNotNull())
        .select("sh")
        .distinct()
    )


def contamination_scores(
    corpus: DataFrame,
    blocklist: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
) -> DataFrame:
    """Per-document contamination: ``(id_col, n_shingles, n_hits,
    contamination)`` where ``contamination`` is the fraction of the
    document's distinct ``n``-gram hashes found in ``blocklist``
    (0.0 for documents shorter than ``n`` tokens — nothing to match).

    The blocklist join is an explicit broadcast; the per-document
    aggregation is the only exchange and carries three numbers per
    document."""
    sh = _shingles(corpus, id_col, text_col, n)
    bl = F.broadcast(blocklist.select(F.col("sh"), F.lit(1).alias("_hit")))
    # count(sh) ignores the NULL row a sub-n document carries, so such
    # documents aggregate to (0 shingles, 0 hits) without a restore join
    scored = (
        sh.join(bl, on="sh", how="left")
        .groupBy("_id")
        .agg(
            F.count("sh").alias("n_shingles"),
            F.sum(F.coalesce("_hit", F.lit(0))).alias("n_hits"),
        )
    )
    return scored.select(
        F.col("_id").alias(id_col),
        F.col("n_shingles").cast("long").alias("n_shingles"),
        F.col("n_hits").cast("long").alias("n_hits"),
        F.when(
            F.col("n_shingles") > 0,
            F.round(F.col("n_hits") / F.col("n_shingles"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("contamination"),
    )
