"""End-to-end KG construction over transcripts (north_star pipeline).

Stages (each a checkpointed table via sinks.StageStore; resumable):

  ingest        transcripts, bucketed by hash(conv_id)
  mentions      candidate grams (Arrow-batched UDF, pipeline.mentions)
  linked        entity-link scoring: exact + fuzzy candidates against the
                alias dictionary (broadcast or salted join), ensemble
                rating = w_s * levenshtein + w_e * embedding-cosine,
                best-per-mention selection
  triples_raw   predicate extraction per turn (pattern join over token
                positions) + cross-turn `follows` via turn-ordered window
  entity_map    canonicalization: alias-overlap edges -> connected
                components -> entity_id -> canonical_id
  triples       canonical (subj, pred, obj, conv_id, turn_idx), bucketed
                by hash(conv_id), sorted within partitions by
                (conv_id, turn_idx)

The reference analogue is Prom.run_all (reference src/prom.py:201-213):
lexical/structural matching -> selection -> link ontology -> merged
concept clusters; here matching is mention⋈dictionary scoring, the link
ontology is the triple table, and cluster merging is connected
components.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from prom_spark.config import DEFAULT_CONFIG, PipelineConfig
from prom_spark.datagen import PREDICATES
from prom_spark.functions.embedding import hash_embedding
from prom_spark.functions.similarity import cosine_sim, norm_levenshtein
from prom_spark.operators.connected_components import connected_components
from prom_spark.operators.salted_join import salted_join
from prom_spark.operators.selection import best_candidate_per_left
from prom_spark.pipeline.mentions import detect_mentions
from prom_spark.sinks import StageStore

N_BUCKETS = 32


@dataclass
class KgResult:
    triples: DataFrame
    entity_canonical: DataFrame
    linked_mentions: DataFrame
    store: StageStore


def link_mentions(
    mentions: DataFrame,
    dictionary: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    use_salting: bool = True,
) -> DataFrame:
    """Entity-link scoring join (north_star stage 3).

    Exact path: equi-join gram == alias (salted on detected hot grams —
    mention frequency is Zipf). Fuzzy path: block on (first char, token
    count), score ensemble of normalized Levenshtein + embedding cosine.
    Selection: best candidate per mention occurrence, longest gram first.
    """
    dict_slim = dictionary.select("alias", "entity_id", "embedding")

    exact_raw = (
        salted_join(
            mentions,
            dict_slim.withColumnRenamed("alias", "gram"),
            key="gram",
            n_salts=cfg.hot_key_salts,
            hot_factor=cfg.hot_key_factor,
        )
        if use_salting
        else mentions.join(
            F.broadcast(dict_slim.withColumnRenamed("alias", "gram")), on="gram"
        )
    )
    exact = exact_raw.withColumn("rating", F.lit(1.0)).select(
        "conv_id", "turn_idx", "gram", "start", "end", "entity_id", "rating"
    )

    # fuzzy path: score DISTINCT unmatched grams against the dictionary
    # (blocked on first char + word count), then re-join to occurrences.
    # Scoring per distinct gram instead of per occurrence cuts the
    # levenshtein+embedding work by the mention duplication factor —
    # with Zipf-skewed mentions that factor is enormous.
    # gram embeddings are PRE-projected as a column: inlining the
    # embedding expression inside cosine_sim would re-evaluate the md5
    # transform once per cosine term (dot + both norms) with no codegen
    # CSE across higher-order functions — measured 60x slower.
    distinct_grams = (
        mentions.select("gram")
        .distinct()
        .join(dict_slim, F.col("gram") == dict_slim["alias"], "left_anti")
        .withColumn("gram_emb", hash_embedding(F.col("gram")))
        .withColumn("_blk", F.substring("gram", 1, 1))
        .withColumn("_nw", F.size(F.split("gram", " ")))
    )
    d_blocked = dict_slim.withColumn("_blk", F.substring("alias", 1, 1)).withColumn(
        "_nw", F.size(F.split("alias", " "))
    )
    fuzzy_scores = (
        distinct_grams.join(F.broadcast(d_blocked), on=["_blk", "_nw"])
        .withColumn("_lev", norm_levenshtein("gram", "alias"))
        .filter(F.col("_lev") >= 0.5)
        .withColumn(
            "rating",
            F.lit(cfg.link_string_weight) * F.col("_lev")
            + F.lit(cfg.link_embedding_weight)
            * F.greatest(F.lit(0.0), cosine_sim("gram_emb", "embedding")),
        )
        .filter(F.col("rating") > cfg.link_threshold)
        .select("gram", "entity_id", "rating")
    )
    fuzzy = mentions.join(fuzzy_scores, on="gram").select(
        "conv_id", "turn_idx", "gram", "start", "end", "entity_id", "rating"
    )

    candidates = exact.unionByName(fuzzy)
    return best_candidate_per_left(
        candidates,
        uid1_col=["conv_id", "turn_idx", "start", "end"],
        uid2_col="entity_id",
        threshold=cfg.link_threshold,
        extra_order=[(F.col("end") - F.col("start")).desc()],
    )


def extract_triples(
    transcripts: DataFrame, linked: DataFrame, mentions: DataFrame
) -> DataFrame:
    """Predicate extraction (north_star stage 4).

    Within-turn: pattern `<subj mention> <pred token> [the] <obj mention>`
    — a position-equi-join of linked mentions against predicate tokens.
    Cross-turn: `follows` edges between consecutive turns' subject
    entities via a (conv_id)-partitioned window ordered by turn_idx
    (the stable-ordering invariant O4).
    """
    preds = mentions.filter(F.col("gram").isin(*PREDICATES)).select(
        "conv_id", "turn_idx", F.col("gram").alias("pred"), F.col("start").alias("p")
    )
    # prefer the longest linked gram per occupied span endpoint
    subj = linked.select(
        "conv_id", "turn_idx", F.col("entity_id").alias("subj"), F.col("end").alias("s_end")
    )
    obj = linked.select(
        "conv_id", "turn_idx", F.col("entity_id").alias("obj"), F.col("start").alias("o_start")
    )
    within = (
        preds.join(subj, on=["conv_id", "turn_idx"])
        .filter(F.col("s_end") == F.col("p") - 1)
        .join(obj, on=["conv_id", "turn_idx"])
        .filter((F.col("o_start") == F.col("p") + 1) | (F.col("o_start") == F.col("p") + 2))
        .select("conv_id", "turn_idx", "subj", "pred", "obj")
        .distinct()
    )

    # subject entity per turn = earliest linked mention
    w_first = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.col("start"), F.col("entity_id")
    )
    turn_subjects = (
        linked.withColumn("_rk", F.row_number().over(w_first))
        .filter(F.col("_rk") == 1)
        .select("conv_id", "turn_idx", F.col("entity_id").alias("subj"))
    )
    w_conv = Window.partitionBy("conv_id").orderBy("turn_idx")
    follows = (
        turn_subjects.withColumn("prev", F.lag("subj").over(w_conv))
        .filter(F.col("prev").isNotNull())
        .select(
            "conv_id",
            "turn_idx",
            F.col("subj"),
            F.lit("follows").alias("pred"),
            F.col("prev").alias("obj"),
        )
    )
    # within-turn co-occurrence: distinct entity pairs sharing a turn
    l1 = linked.select("conv_id", "turn_idx", F.col("entity_id").alias("subj"))
    l2 = linked.select("conv_id", "turn_idx", F.col("entity_id").alias("obj"))
    cooc = (
        l1.join(l2, on=["conv_id", "turn_idx"])
        .filter(F.col("subj") < F.col("obj"))
        .select("conv_id", "turn_idx", "subj", F.lit("co_occurs").alias("pred"), "obj")
        .distinct()
    )
    return within.unionByName(follows).unionByName(cooc)


def canonicalize_entities(dictionary: DataFrame) -> DataFrame:
    """Entity merge (north_star stage 6): entities sharing a surface form
    are the same concept; connected components over alias-overlap edges,
    canonical id = min entity_id of the cluster."""
    a = dictionary.select("alias", F.col("entity_id").alias("e1"))
    b = dictionary.select("alias", F.col("entity_id").alias("e2"))
    edges = (
        a.join(b, on="alias")
        .filter(F.col("e1") < F.col("e2"))
        .select(F.col("e1").alias("src"), F.col("e2").alias("dst"))
        .distinct()
    )
    cc = connected_components(edges, "src", "dst")
    all_entities = dictionary.select("entity_id").distinct()
    return (
        all_entities.join(cc, all_entities.entity_id == cc.node, "left")
        .select(
            "entity_id",
            F.coalesce(F.col("component"), F.col("entity_id")).alias("canonical_id"),
        )
    )


def transcripts_from_documents(
    documents: DataFrame, tokens_per_turn: int = 20
) -> DataFrame:
    """Re-shape a documents table into the transcript schema (input_hint):
    each document becomes one conversation, its text chunked into turns.
    Used by the flagship entry over the driver's testdata."""
    toks = documents.select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("conv_id"),
        F.col("doc_id"),
        F.posexplode(F.split(F.trim(F.lower("text")), r"\s+")).alias("pos", "tok"),
    )
    turns = (
        toks.withColumn("turn_idx", (F.col("pos") / tokens_per_turn).cast("int"))
        .groupBy("conv_id", "doc_id", "turn_idx")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda x: x["tok"],
                ),
                " ",
            ).alias("text")
        )
    )
    roles = F.array(F.lit("user"), F.lit("assistant"))
    return turns.select(
        "conv_id",
        "turn_idx",
        F.element_at(roles, (F.col("turn_idx") % 2 + 1).cast("int")).alias("role"),
        "text",
        F.lit(None).cast("string").alias("tool"),
        (F.lit(1735689600) + F.col("doc_id") * 1000 + F.col("turn_idx")).cast("timestamp").alias("ts"),
    )


def term_dictionary(spark, terms: list[str]) -> DataFrame:
    """Minimal entity dictionary from a fixed term list (flagship entry)."""
    df = spark.createDataFrame([(t,) for t in terms], "alias string")
    return df.select(
        "alias",
        F.concat(F.lit("E_"), F.col("alias")).alias("entity_id"),
        F.col("alias").alias("canonical"),
        hash_embedding(F.col("alias")).alias("embedding"),
    )


def build_kg(
    spark,
    transcripts: DataFrame,
    dictionary: DataFrame,
    base_dir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    resume: bool = True,
    use_salting: bool = True,
) -> KgResult:
    """Run (or resume) the full pipeline, checkpointing every stage."""
    store = StageStore(spark, base_dir)

    ingest = store.get_or_compute(
        "ingest",
        lambda: transcripts.withColumn(
            "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(N_BUCKETS)).cast("int")
        ).repartition(N_BUCKETS, "bucket"),
        resume=resume,
        inputs=["<source transcripts>"],
        partition_by=["bucket"],
        sort_within_partitions=["conv_id", "turn_idx"],
    )

    mentions = store.get_or_compute(
        "mentions",
        lambda: detect_mentions(ingest),
        resume=resume,
        inputs=["ingest"],
    )

    linked = store.get_or_compute(
        "linked",
        lambda: link_mentions(mentions, dictionary, cfg, use_salting=use_salting),
        resume=resume,
        inputs=["mentions", "<dictionary>"],
    )

    triples_raw = store.get_or_compute(
        "triples_raw",
        lambda: extract_triples(ingest, linked, mentions),
        resume=resume,
        inputs=["ingest", "linked", "mentions"],
    )

    entity_map = store.get_or_compute(
        "entity_map",
        lambda: canonicalize_entities(dictionary),
        resume=resume,
        inputs=["<dictionary>"],
    )

    def _final() -> DataFrame:
        m = F.broadcast(entity_map)
        t = (
            triples_raw.join(
                m.withColumnRenamed("entity_id", "subj").withColumnRenamed(
                    "canonical_id", "subj_canonical"
                ),
                on="subj",
                how="left",
            )
            .join(
                m.withColumnRenamed("entity_id", "obj").withColumnRenamed(
                    "canonical_id", "obj_canonical"
                ),
                on="obj",
                how="left",
            )
            .select(
                F.coalesce("subj_canonical", "subj").alias("subj"),
                "pred",
                F.coalesce("obj_canonical", "obj").alias("obj"),
                "conv_id",
                "turn_idx",
            )
            .distinct()
            .withColumn(
                "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(N_BUCKETS)).cast("int")
            )
            .repartition(N_BUCKETS, "bucket")
        )
        return t

    triples = store.get_or_compute(
        "triples",
        _final,
        resume=resume,
        inputs=["triples_raw", "entity_map"],
        partition_by=["bucket"],
        sort_within_partitions=["conv_id", "turn_idx"],
    )
    return KgResult(triples, entity_map, linked, store)
