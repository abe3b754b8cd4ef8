"""Deduplication operators for large text corpora.

Training-data-pipeline first-class citizens: exact, MinHash+LSH, SimHash,
n-gram Jaccard, and embedding-cosine near-dup. All are compositions of
built-in DataFrame ops (explode/groupBy/join) — no UDFs — so they scale
with the shuffle, and all hashing is md5-based (deterministic and
engine-portable; the q13/q15 oracle twins in prom_spark.queries compute
identical values in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prom_spark.functions.similarity import cosine_sim
from prom_spark.functions.text import doc_fingerprint


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array_distinct(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
        ).alias("tok"),
    )


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace-normalized exact dedup groups.

    Returns (fingerprint, keeper, n_docs) with keeper = min id; join back
    with ``df`` on fingerprint to drop non-keepers.
    """
    return (
        df.select(F.col(id_col).alias("_id"), doc_fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("_id").alias("keeper"), F.count("*").alias("n_docs"))
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 16
) -> DataFrame:
    """(id, n_tok, h0..h{k-1}) md5-based MinHash signatures."""
    toks = _tokens(df, id_col, text_col)
    return toks.groupBy("_id").agg(
        F.count("*").alias("n_tok"),
        *[
            F.min(F.md5(F.concat(F.col("tok"), F.lit(f":{i}")))).alias(f"h{i}")
            for i in range(num_hashes)
        ],
    ).withColumnRenamed("_id", id_col)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    band_size: int = 4,
    jaccard_threshold: float = 0.7,
    max_bucket: int = 100,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding, verified with exact
    token-set Jaccard.

    ``max_bucket`` skips degenerate buckets (all-similar corpora make
    banding quadratic); skipped volume is observable via
    ``lsh_bucket_stats``. Returns (id1, id2, jaccard).
    """
    assert num_hashes % band_size == 0
    sig = minhash_signatures(df, id_col, text_col, num_hashes)
    bands = sig.select(
        F.col(id_col).alias("_id"),
        "n_tok",
        F.explode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            "|", *[f"h{b * band_size + j}" for j in range(band_size)]
                        )
                    )
                    for b in range(num_hashes // band_size)
                ]
            )
        ).alias("bucket"),
    )
    ok_buckets = (
        bands.groupBy("bucket").agg(F.count("*").alias("_bs"))
        .filter(F.col("_bs") <= max_bucket)
        .select("bucket")
    )
    bands = bands.join(ok_buckets, on="bucket")
    pairs = (
        bands.alias("a")
        .join(bands.alias("b"), on="bucket")
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id1"),
            F.col("b._id").alias("id2"),
            F.col("a.n_tok").alias("n1"),
            F.col("b.n_tok").alias("n2"),
        )
        .distinct()
    )
    t1 = _tokens(df, id_col, text_col).withColumnRenamed("_id", "id1")
    t2 = _tokens(df, id_col, text_col).withColumnRenamed("_id", "id2")
    inter = (
        pairs.join(t1, on="id1")
        .join(t2, on=["id2", "tok"])
        .groupBy("id1", "id2", "n1", "n2")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n1") + F.col("n2") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id1", "id2", "jaccard")
    )


def lsh_bucket_stats(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 16, band_size: int = 4
) -> DataFrame:
    """Bucket-size histogram — the 'no silent caps' observability hook."""
    sig = minhash_signatures(df, id_col, text_col, num_hashes)
    bands = sig.select(
        F.explode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            "|", *[f"h{b * band_size + j}" for j in range(band_size)]
                        )
                    )
                    for b in range(num_hashes // band_size)
                ]
            )
        ).alias("bucket")
    )
    return bands.groupBy("bucket").count().groupBy("count").agg(
        F.count("*").alias("n_buckets")
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """(id, simhash bit-string) from md5 hex-digit parities."""
    hexs = "0123456789abcdef"
    toks = _tokens(df, id_col, text_col)
    contrib = toks.select(
        "_id",
        F.md5("tok").alias("h"),
        F.explode(F.sequence(F.lit(1), F.lit(bits))).alias("b"),
    ).select(
        "_id",
        "b",
        F.when(((F.instr(F.lit(hexs), F.expr("substr(h, b, 1)")) - 1) % 2) == 1, 1)
        .otherwise(-1)
        .alias("v"),
    )
    return (
        contrib.groupBy("_id", "b")
        .agg(F.sum("v").alias("s"))
        .withColumn("bit", F.when(F.col("s") > 0, F.lit("1")).otherwise(F.lit("0")))
        .groupBy("_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("b", "bit"))), lambda x: x["bit"]
                ),
            ).alias("simhash")
        )
        .withColumnRenamed("_id", id_col)
    )


def simhash_near_dupes(
    df: DataFrame, id_col: str, text_col: str, bits: int = 16, max_hamming: int = 2
) -> DataFrame:
    """Pairs whose SimHashes differ in <= max_hamming bits; candidates
    blocked on hash halves (a pair within distance 2 over 16 bits shares
    at least one untouched half for distance <= 1 per half; both halves
    explored for completeness at distance 2)."""
    s = simhash(df, id_col, text_col, bits)
    half = bits // 2
    blocked = s.select(
        F.col(id_col).alias("_id"),
        "simhash",
        F.explode(
            F.array(
                F.concat(F.lit("L:"), F.substring("simhash", 1, half)),
                F.concat(F.lit("R:"), F.substring("simhash", half + 1, half)),
            )
        ).alias("blk"),
    )
    pairs = (
        blocked.alias("a")
        .join(blocked.alias("b"), on="blk")
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id1"),
            F.col("b._id").alias("id2"),
            F.col("a.simhash").alias("s1"),
            F.col("b.simhash").alias("s2"),
        )
        .distinct()
    )
    hamming = F.size(
        F.filter(
            F.zip_with(F.split("s1", ""), F.split("s2", ""), lambda x, y: x != y),
            lambda d: d,
        )
    )
    return pairs.withColumn("hamming", hamming).filter(
        F.col("hamming") <= max_hamming
    ).select("id1", "id2", "hamming")


def embedding_near_dupes(
    df: DataFrame,
    id_col: str,
    emb_col: str,
    threshold: float = 0.95,
    n_hyperplanes: int = 8,
) -> DataFrame:
    """Embedding-cosine near-dup via random-hyperplane LSH bucketing.

    Hyperplanes are deterministic hash embeddings of fixed seed strings;
    candidates share the full sign signature (cos >= .95 pairs almost
    always do at 8 planes), then exact cosine verifies.
    """
    from prom_spark.functions.embedding import hash_embedding

    first = df.select(F.col(emb_col)).limit(1).collect()
    dim = len(first[0][0]) if first else 0
    if dim == 0:
        return df.sparkSession.createDataFrame(
            [], "id1 long, id2 long, cosine double"
        )
    planes = [
        [float(x) for x in row]
        for row in df.sparkSession.range(n_hyperplanes)
        .select(hash_embedding(F.concat(F.lit("plane:"), F.col("id")), dim=min(16, dim)).alias("p"))
        .collect()
        for row in [row.p]
    ]
    e = df.select(F.col(id_col).alias("_id"), F.col(emb_col).cast("array<double>").alias("e"))
    sig = e
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(x) for x in p])
        dot = F.aggregate(
            F.zip_with(F.slice("e", 1, len(p)), arr, lambda x, y: x * y),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        sig = sig.withColumn(f"b{i}", (dot > 0).cast("int"))
    sig = sig.withColumn(
        "bucket", F.concat_ws("", *[f"b{i}" for i in range(len(planes))])
    ).select("_id", "e", "bucket")
    pairs = (
        sig.alias("a")
        .join(sig.alias("b"), on="bucket")
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id1"),
            F.col("b._id").alias("id2"),
            cosine_sim(F.col("a.e"), F.col("b.e")).alias("cosine"),
        )
    )
    return pairs.filter(F.col("cosine") >= threshold)
