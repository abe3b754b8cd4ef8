"""Deduplication operators for large text corpora.

Training-data-pipeline first-class citizens: exact, MinHash+LSH, SimHash,
n-gram Jaccard, and embedding-cosine near-dup. All are compositions of
built-in DataFrame ops (explode/groupBy/join) so they scale with the
shuffle; the one Python kernel is the Arrow-batched hyperplane-signature
matmul (``_band_bucket_udf`` — a per-partition numpy matmul, not per-row
Python). All hashing is md5-based (deterministic and engine-portable;
the q13/q15 oracle twins in prom_spark.queries compute identical values
in DuckDB).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

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
    tokens: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding, verified with exact
    token-set Jaccard.

    ``max_bucket`` skips degenerate buckets (all-similar corpora make
    banding quadratic); skipped volume is observable via
    ``lsh_bucket_stats``. Returns (id1, id2, jaccard).

    ``tokens``: optional pre-tokenized (_id, tok) frame. The plan reads
    the token relation three times (signatures + both sides of the
    verification join); passing a materialized/cached frame here turns
    those into three scans of a columnar table instead of three
    tokenization passes over the raw text.
    """
    assert num_hashes % band_size == 0
    toks = tokens if tokens is not None else _tokens(df, id_col, text_col)
    sig = (
        toks.groupBy("_id")
        .agg(
            F.count("*").alias("n_tok"),
            *[
                F.min(F.md5(F.concat(F.col("tok"), F.lit(f":{i}")))).alias(f"h{i}")
                for i in range(num_hashes)
            ],
        )
        .withColumnRenamed("_id", id_col)
    )
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
    t1 = toks.withColumnRenamed("_id", "id1")
    t2 = toks.withColumnRenamed("_id", "id2")
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
    """(id, simhash bit-string) from md5 hex-digit parities.

    ``bits`` <= 32 takes parities from one md5 digest (32 hex digits);
    33..64 appends a second digest ``md5(tok || '#2')`` — a 16-bit space
    saturates at corpus scale (>= 10^9 docs put ~10^4+ docs in EVERY
    bucket, making hamming <= k effectively all-pairs), so near-dup
    callers default to 64.
    """
    assert 1 <= bits <= 64, "md5 two-digest scheme supports <= 64 bits"
    toks = _tokens(df, id_col, text_col)
    digest = (
        F.md5("tok")
        if bits <= 32
        else F.concat(F.md5("tok"), F.md5(F.concat("tok", F.lit("#2"))))
    )
    # one groupBy(_id) with `bits` independent sum aggregates: the
    # per-bit parity contributions are summed MAP-SIDE (HashAggregate
    # partial merge), so the shuffle carries |docs| rows of `bits` longs
    # instead of the |docs| × |tokens| × bits row explosion the
    # per-bit-row formulation cost (the explode dominated q29 at sf0.1;
    # at corpus scale it multiplies the token stream 64×). Per row the
    # digest's hex digits are converted ONCE into 32-bit integer chunks,
    # and each bit's parity is a shift+mask on its nibble's low bit —
    # 64 string-scan expressions (substring+instr per bit per token)
    # measured 4× slower than this integer form at the same plan shape.
    n_chunks = (bits + 7) // 8
    chunked = toks.select(
        F.col("_id"),
        *[
            F.conv(F.substring(digest, 1 + 8 * c, 8), 16, 10)
            .cast("long")
            .alias(f"_c{c}")
            for c in range(n_chunks)
        ],
    )

    def _parity_sum(b: int):
        ci, pi = (b - 1) // 8, (b - 1) % 8
        parity = F.shiftright(F.col(f"_c{ci}"), (7 - pi) * 4).bitwiseAND(F.lit(1))
        return F.sum(parity).alias(f"_p{b}")

    sums = chunked.groupBy("_id").agg(
        F.count(F.lit(1)).alias("_n"),
        *[_parity_sum(b) for b in range(1, bits + 1)],
    )
    # sign of sum(±1) == (2 * ones - n) > 0
    return sums.select(
        F.col("_id").alias(id_col),
        F.concat(
            *[
                F.when(2 * F.col(f"_p{b}") - F.col("_n") > 0, F.lit("1")).otherwise(
                    F.lit("0")
                )
                for b in range(1, bits + 1)
            ]
        ).alias("simhash"),
    )


def simhash_near_dupes(
    df: DataFrame, id_col: str, text_col: str, bits: int = 64, max_hamming: int = 2
) -> DataFrame:
    """Pairs whose SimHashes differ in <= max_hamming bits.

    Complete by the pigeonhole principle: candidates are blocked on
    ``max_hamming + 1`` disjoint bit bands — a pair within distance d can
    touch at most d bands, so with d+1 bands at least one band is
    bit-identical on both sides and the pair lands in a shared bucket.
    (Blocking on fewer bands than d+1 silently drops pairs whose
    differing bits straddle every band.)

    Default width is 64 (two md5 digests): at 16 bits the OUTPUT
    relation itself saturates at corpus scale — 2^16 hash values cannot
    separate >= 10^6 docs, so hamming <= k degenerates toward all-pairs
    regardless of blocking (measured 29% pair density on a 500-doc
    corpus). Pair density is observable via ``simhash_block_stats``; the
    16-bit mode remains for small vocabularies and oracle twins.
    """
    # pin the signature table: the banded candidate join is a SELF-join,
    # and without the pin Catalyst re-plans (and re-executes) the whole
    # tokenize+digest+aggregate subtree on BOTH sides (the q26/q31
    # shared-subtree pattern); signatures are one short row per doc, the
    # cheapest possible thing to materialize
    s = simhash(df, id_col, text_col, bits).localCheckpoint(eager=False)
    n_bands = max_hamming + 1
    assert n_bands <= bits, "need at least one bit per band"
    sizes = [bits // n_bands + (1 if i < bits % n_bands else 0) for i in range(n_bands)]
    starts = [1 + sum(sizes[:i]) for i in range(n_bands)]
    blocked = s.select(
        F.col(id_col).alias("_id"),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit(f"{i}:"), F.substring("simhash", starts[i], sizes[i])
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("blk"),
    )
    # verification stays inside whole-stage codegen: XOR + bit_count on
    # <=32-bit integer chunks of the bit-string (a zip_with over split
    # chars is interpreted per candidate row; conv() of a full 64-bit
    # string overflows LongType, so chunk at 32)
    def _chunk_ham(start: int, length: int):
        a = F.conv(F.substring("s1", start, length), 2, 10).cast("long")
        b = F.conv(F.substring("s2", start, length), 2, 10).cast("long")
        return F.bit_count(a.bitwiseXOR(b))

    hamming = _chunk_ham(1, min(32, bits))
    if bits > 32:
        hamming = hamming + _chunk_ham(33, bits - 32)
    # verify BEFORE dedup: a pair surfaces once per matching band (<= d+1
    # times), and on a template-similar corpus candidate volume is large
    # (758k candidates from 5k docs measured at sf0.1) — the hamming
    # filter is pure codegen on the joined stream, so running it first
    # means only true near-dup pairs (plus band duplicates) cross the
    # distinct's exchange, instead of every candidate carrying two
    # 64-char signatures through the shuffle
    return (
        blocked.alias("a")
        .join(blocked.alias("b"), on="blk")
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id1"),
            F.col("b._id").alias("id2"),
            F.col("a.simhash").alias("s1"),
            F.col("b.simhash").alias("s2"),
        )
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id1", "id2", "hamming")
        .distinct()
    )


def simhash_block_stats(
    df: DataFrame, id_col: str, text_col: str, bits: int = 64, max_hamming: int = 2
) -> DataFrame:
    """Band-bucket-size histogram for ``simhash_near_dupes`` — the
    'no silent caps' observability hook: candidate volume is
    sum(bucket_size^2) over these buckets, so a saturating hash width
    (or a degenerate near-identical corpus) shows up here BEFORE the
    pair join runs."""
    s = simhash(df, id_col, text_col, bits)
    n_bands = max_hamming + 1
    sizes = [bits // n_bands + (1 if i < bits % n_bands else 0) for i in range(n_bands)]
    starts = [1 + sum(sizes[:i]) for i in range(n_bands)]
    buckets = s.select(
        F.explode(
            F.array(
                *[
                    F.concat(F.lit(f"{i}:"), F.substring("simhash", starts[i], sizes[i]))
                    for i in range(n_bands)
                ]
            )
        ).alias("blk")
    )
    return buckets.groupBy("blk").count().groupBy("count").agg(
        F.count("*").alias("n_buckets")
    )


def _deterministic_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Full-dimension deterministic hyperplanes from md5 digests.

    Each component is one byte of md5("plane:<p>:<block>") centered on 0,
    so planes span the WHOLE embedding space (a low-dim plane subspace
    cannot separate directions living in the remaining dimensions).
    """
    import hashlib

    planes = []
    for p in range(n_planes):
        comps: list[float] = []
        blk = 0
        while len(comps) < dim:
            digest = hashlib.md5(f"plane:{p}:{blk}".encode()).digest()
            comps.extend(b / 255.0 - 0.5 for b in digest)
            blk += 1
        planes.append(comps[:dim])
    return planes


def _band_bucket_udf(planes: list[list[float]], band_planes: int, n_bands: int):
    """Arrow-batched kernel computing ALL band bucket keys per row.

    One numpy matmul against the (n_planes, dim) plane matrix replaces
    n_planes sequential interpreted ``aggregate(zip_with(...))``
    expressions — Spark HOFs never enter whole-stage codegen, so the
    per-row interpreted cost of the expression form dominated at scale
    (measured 71.8s on ~1k rows at 24 planes; the matmul is
    milliseconds). The plane matrix is a closure constant shipped once
    per executor with the UDF, not a per-row literal array in the plan.
    Bucket strings are byte-identical to the expression form (and to the
    DuckDB oracle twin): "<band>:<sign bits>".
    """
    # top-level imports so the stringified type hints (PEP 563 via the
    # module's `from __future__ import annotations`) resolve from the
    # function's globals when pandas_udf infers the eval type
    P = np.asarray(planes, dtype=np.float64).T  # (dim, n_planes)

    @pandas_udf("array<string>")
    def buckets(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        E = np.stack([np.asarray(x, dtype=np.float64) for x in emb])
        bits = (E @ P > 0).astype(np.uint8)  # (rows, n_planes)
        out = []
        for row in bits:
            out.append(
                [
                    f"{b}:" + "".join(
                        str(v) for v in row[b * band_planes : (b + 1) * band_planes]
                    )
                    for b in range(n_bands)
                ]
            )
        return pd.Series(out)

    return buckets


def embedding_near_dupes(
    df: DataFrame,
    id_col: str,
    emb_col: str,
    threshold: float = 0.95,
    band_planes: int = 12,
    n_bands: int = 12,
) -> DataFrame:
    """Embedding-cosine near-dup via banded random-hyperplane LSH.

    Signatures are OR-ed over ``n_bands`` bands of ``band_planes`` sign
    bits each: a candidate pair only needs ONE fully-matching band. At
    cos = 0.95 (angle ~18.2 deg) a single plane agrees with p ~ 0.899,
    so a 12-plane band matches with 0.899^12 ~ 0.28 — and 12 bands miss
    with only (1-0.28)^12 ~ 0.02, i.e. recall ~ 0.98 at the threshold
    (higher above it). Band selectivity is the flip side: a RANDOM pair
    matches a 12-bit band with 2^-12, so expected false candidates are
    ~0.3% of all pairs — the previous 4-bit bands matched random pairs
    at ~6/16 = 37%, which made the candidate join itself quadratic.
    Survivors are verified with exact cosine, so precision is exact.

    Sign bits come from one Arrow-batched numpy matmul per partition
    (``_band_bucket_udf``) — same deterministic planes, same bucket
    strings as the DuckDB oracle twin. The bucket self-join carries only
    (id, bucket); embeddings re-join per candidate pair by id, so the
    wide payload never rides the candidate shuffle.
    """
    first = df.select(F.col(emb_col)).limit(1).collect()
    dim = len(first[0][0]) if first else 0
    if dim == 0:
        return df.sparkSession.createDataFrame(
            [], "id1 long, id2 long, cosine double"
        )
    planes = _deterministic_planes(band_planes * n_bands, dim)
    e = df.select(F.col(id_col).alias("_id"), F.col(emb_col).cast("array<double>").alias("e"))
    buckets = _band_bucket_udf(planes, band_planes, n_bands)
    sig = e.select("_id", F.explode(buckets(F.col("e"))).alias("bucket"))
    pairs = (
        sig.alias("a")
        .join(sig.alias("b"), on="bucket")
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id1"), F.col("b._id").alias("id2"))
        # dedup multi-band collisions on the slim (id1, id2) pair; the
        # embedding payloads re-join per candidate below instead of
        # riding the candidate shuffle
        .distinct()
    )
    scored = (
        pairs.join(e.select(F.col("_id").alias("id1"), F.col("e").alias("e1")), on="id1")
        .join(e.select(F.col("_id").alias("id2"), F.col("e").alias("e2")), on="id2")
        .select("id1", "id2", cosine_sim("e1", "e2").alias("cosine"))
    )
    return scored.filter(F.col("cosine") >= threshold)


def dedup_representatives(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    order_col: str | None = None,
    descending: bool = True,
) -> DataFrame:
    """Cluster near-dup PAIRS into groups and pick one representative
    per group — the step that turns any pair relation (MinHash-LSH,
    SimHash, embedding-cosine) into an actual corpus reduction.

    Clusters are connected components over the pair graph (large-star /
    small-star joins with lineage checkpoints — transitive closure, so
    A~B, B~C collapses to one cluster even when A~C was never a
    candidate pair). The representative is the cluster's best row by
    ``order_col`` (default: the minimum id — fully deterministic), ties
    broken by id. Singletons (docs in no pair) are their own cluster
    and always kept.

    Returns ``docs`` columns + ``cluster`` + boolean ``keep``. Designed
    scale shape: the pair graph is tiny relative to the corpus (it only
    holds near-dups), so CC runs on the small relation; the corpus
    itself is touched by ONE left join against the (node, component)
    table and one window over clusters — and cluster sizes are near-dup
    group sizes, bounded in practice, so the window cannot see a
    corpus-sized partition.
    """
    from pyspark.sql import Window

    from prom_spark.operators.connected_components import connected_components

    comp = connected_components(pairs, src="id1", dst="id2")
    labeled = docs.join(
        comp.select(F.col("node").alias(id_col), "component"),
        on=id_col,
        how="left",
    ).withColumn("cluster", F.coalesce("component", F.col(id_col))).drop(
        "component"
    )
    if order_col is None:
        rank_order = [F.asc(id_col)]
    else:
        rank_order = [
            F.desc(order_col) if descending else F.asc(order_col),
            F.asc(id_col),
        ]
    w = Window.partitionBy("cluster").orderBy(*rank_order)
    return labeled.withColumn(
        "keep", F.row_number().over(w) == 1
    )
