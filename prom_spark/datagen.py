"""Deterministic synthetic transcript + entity-dictionary generation.

FIXTURES.md §1: transcripts (conv_id, turn_idx, role, text, tool, ts)
with Zipf-distributed entity mentions (hot entities exercise the salted
join). Everything is generated *inside Spark* from ``spark.range`` with
pure column expressions — no driver-side row lists — so the same code
generates 10^3 or 10^12 turns; determinism comes from xxhash64 of the
row id with fixed string seeds, never from RNG state.

Each turn's text embeds a recoverable fact pattern
``... <alias1> <verb> <alias2> ...`` so predicate extraction has ground
truth. The entity dictionary contains deliberate duplicate entities
(same canonical name, distinct ids) so canonicalization has real work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from prom_spark.functions.embedding import hash_embedding

# canonical entity names: compact, lowercase, unambiguous tokens
_BASE_ENTITIES = [
    "conveyor", "spindle", "gripper", "sensor", "actuator", "controller",
    "furnace", "lathe", "press", "welder", "robot", "turbine", "compressor",
    "boiler", "crane", "forklift", "drill", "grinder", "mixer", "pump",
    "valve", "motor", "gearbox", "bearing", "coupling", "clutch", "chassis",
    "fixture", "pallet", "hopper", "feeder", "cutter",
]
PREDICATES = ["uses", "feeds", "precedes", "controls"]
ROLES = ["user", "assistant", "tool", "system"]

# neutral filler: no predicate verbs, no dictionary nouns, no "in this
# step" — cannot collide with the fact pattern or the alias dictionary
_FILLER_PHRASES = [
    "please confirm when you can and reply with details",
    "checking previous results for anything unusual before we move on",
    "that looks fine to me so far given current constraints",
    "let me know if you need more context about it",
    "we should double check every value against yesterday's report",
    "i will summarize what happened and share notes shortly",
    "according to our records everything stayed within expected limits",
    "can you clarify which option was selected during setup",
    "thanks for flagging that issue earlier it helps a lot",
    "there is nothing else pending on my side right now",
    "remember to log your changes so others stay informed",
    "overall progress seems steady and no blockers were reported",
    "if anything changes overnight send an update first thing",
    "our next review meeting covers these points in depth",
    "make sure backups completed successfully before proceeding further today",
    "sounds good i will follow up with them directly",
]


def entity_dictionary(spark: SparkSession, n_entities: int = 64) -> DataFrame:
    """Entity dictionary: (entity_id, canonical, alias, embedding).

    Aliases per entity: the canonical name, an abbreviated form (first 4
    chars + index), and a suffixed variant. Every 8th entity is a
    *duplicate* of the previous one (same canonical name, distinct id) —
    the canonicalization stage must merge them.
    """
    ids = spark.range(n_entities).withColumnRenamed("id", "eid")
    base = F.array(*[F.lit(e) for e in _BASE_ENTITIES])
    ent = ids.select(
        "eid",
        F.concat(
            F.element_at(base, (F.col("eid") % len(_BASE_ENTITIES) + 1).cast("int")),
            F.when(
                F.col("eid") >= len(_BASE_ENTITIES),
                F.concat(F.lit("-"), (F.col("eid") / len(_BASE_ENTITIES)).cast("long").cast("string")),
            ).otherwise(F.lit("")),
        ).alias("name"),
    )
    # every 8th entity duplicates its predecessor's canonical name
    ent = ent.withColumn(
        "canonical",
        F.when(
            (F.col("eid") % 8 == 7) & (F.col("eid") > 0),
            F.lag("name").over(Window.orderBy("eid")),
        ).otherwise(F.col("name")),
    ).withColumn("entity_id", F.concat(F.lit("E"), F.lpad(F.col("eid").cast("string"), 4, "0")))

    aliases = ent.select(
        "entity_id", "canonical",
        F.explode(
            F.array_distinct(
                F.array(
                    F.col("canonical"),
                    F.concat(F.substring("canonical", 1, 4), F.lit("#"), F.col("eid").cast("string")),
                    F.concat(F.col("canonical"), F.lit(" unit")),
                )
            )
        ).alias("alias"),
    )
    return aliases.withColumn("embedding", hash_embedding(F.col("alias")))


def _zipf_pick(seed_col, n: int, skew: float = 3.0):
    """Zipf-ish index in [0, n): u^skew concentrates mass near 0."""
    u = (F.pmod(seed_col, F.lit(1_000_003)).cast("double")) / 1_000_003.0
    return F.least(F.lit(n - 1), F.floor(F.pow(u, F.lit(skew)) * n).cast("int"))


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 200,
    turns_per_conv: int = 10,
    n_entities: int = 64,
    seed: str = "42",
) -> DataFrame:
    """Deterministic transcripts table (FIXTURES.md §1 schema).

    Each text embeds `<alias_subj> <verb> <alias_obj>` where the subject
    alias index is Zipf-distributed (hot entities). Text content is a
    pure function of (conv_id, turn_idx, seed).
    """
    n = n_convs * turns_per_conv
    dict_rows = entity_dictionary(spark, n_entities).collect()
    alias_pool = F.array(*[F.lit(r.alias) for r in dict_rows])
    n_alias = len(dict_rows)
    preds = F.array(*[F.lit(p) for p in PREDICATES])
    roles = F.array(*[F.lit(r) for r in ROLES])

    df = spark.range(n).select(
        F.concat(F.lit("conv-"), F.lpad((F.col("id") / turns_per_conv).cast("long").cast("string"), 6, "0")).alias("conv_id"),
        (F.col("id") % turns_per_conv).cast("int").alias("turn_idx"),
        F.col("id").alias("_id"),
    )
    h = lambda tag: F.xxhash64(F.lit(seed), F.lit(tag), F.col("_id"))  # noqa: E731
    subj_i = _zipf_pick(h("subj"), n_alias) + 1
    obj_i = (F.pmod(h("obj"), F.lit(n_alias)) + 1).cast("int")
    pred_i = (F.pmod(h("pred"), F.lit(len(PREDICATES))) + 1).cast("int")
    role_i = (F.pmod(h("role"), F.lit(len(ROLES))) + 1).cast("int")
    extra_i = (F.pmod(h("extra"), F.lit(n_alias)) + 1).cast("int")

    # filler prose AFTER the fact sentence: real transcript turns run tens
    # of tokens, not ten — the filler (predicate-free, entity-free neutral
    # phrases) plus one bare extra entity mention make mention detection /
    # linking volumes realistic without touching the verb-triple ground
    # truth (the fact pattern stays byte-identical and first-in-turn).
    phrase_pool = F.array(*[F.lit(p) for p in _FILLER_PHRASES])
    n_ph = len(_FILLER_PHRASES)
    filler = F.concat_ws(
        " ",
        *[
            F.element_at(phrase_pool, (F.pmod(h(f"fill{k}"), F.lit(n_ph)) + 1).cast("int"))
            for k in range(4)
        ],
    )

    df = df.select(
        "conv_id",
        "turn_idx",
        F.element_at(roles, role_i).alias("role"),
        F.concat(
            F.lit("turn "), F.col("turn_idx").cast("string"),
            F.lit(": the "), F.element_at(alias_pool, subj_i),
            F.lit(" "), F.element_at(preds, pred_i),
            F.lit(" the "), F.element_at(alias_pool, obj_i),
            F.lit(" in this step. "), filler,
            F.lit(" note "), F.element_at(alias_pool, extra_i),
            F.lit(" status."),
        ).alias("text"),
        F.when(F.element_at(roles, role_i) == "tool", F.lit("search")).alias("tool"),
        (F.lit(1735689600) + F.col("_id") * 7).cast("timestamp").alias("ts"),
    )
    return df.repartition(max(spark.sparkContext.defaultParallelism, 8), "conv_id")
