"""Lexical (label-based) matching.

Distributed re-expression of the reference's explicit/implicit label
comparison (reference src/compare_by_labels.py:139-344). The reference
enumerates the full cartesian product of elements per type; here every
rule is a *blocked* equi-join:

  explicit equivalence   join on (elem_type, lemma-set key, token count)
  explicit subsumption   exploded-lemma overlap-count join (set containment)
  domain-synset rules    join through the broadcast vocabulary table
  synonym/antonym rules  join through the broadcast alias-expansion table
  reified/drf rules      join of noun-derived verbs against root verbs

Candidate matches carry (elem_type, iri1, iri2, relation, rating) — the
central match IR (reference src/compare_by_labels.py:5). Rule priority
follows the reference's if/elif cascade; contradiction pruning afterwards
is operators.contradictions.reduce_vector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from prom_spark.config import DEFAULT_CONFIG, PipelineConfig

MATCH_COLS = ["elem_type", "iri1", "iri2", "relation", "rating"]

CLS = "owl:Class"
OP = "owl:ObjectProperty"
DP = "owl:DatatypeProperty"


def _side(analyzed: DataFrame, n: int) -> DataFrame:
    """Project an analyzed-labels side to suffixed columns."""
    return analyzed.select(
        F.col("iri").alias(f"iri{n}"),
        F.col("elem_type"),
        F.col("norm_label").alias(f"norm_label{n}"),
        F.col("lemmas").alias(f"lemmas{n}"),
        F.col("lemma_key").alias(f"lemma_key{n}"),
        F.col("lemma_set").alias(f"lemma_set{n}"),
        F.col("n_tokens").alias(f"n_tokens{n}"),
        F.col("passive").alias(f"passive{n}"),
    )


def _exploded_lemmas(analyzed: DataFrame, n: int) -> DataFrame:
    return analyzed.select(
        F.col("iri").alias(f"iri{n}"),
        "elem_type",
        F.col("n_tokens").alias(f"n_tokens{n}"),
        F.col("passive").alias(f"passive{n}"),
        F.size("lemma_set").alias(f"set_size{n}"),
        F.explode("lemmas").alias("tok"),
    ).select(
        f"iri{n}", "elem_type", f"n_tokens{n}", f"passive{n}", f"set_size{n}",
        F.col("tok.lemma").alias("lemma"), F.col("tok.pos").alias("pos"),
    )


def explicit_compare(an1: DataFrame, an2: DataFrame, rating: float) -> DataFrame:
    """Lemma-set equality/containment matching (reference :139-161)."""
    s1, s2 = _side(an1, 1), _side(an2, 2)

    eq = (
        s1.join(
            s2,
            on=[
                s1.elem_type == s2.elem_type,
                s1.lemma_key1 == s2.lemma_key2,
                s1.n_tokens1 == s2.n_tokens2,
                s1.passive1.eqNullSafe(s2.passive2),
            ],
        )
        .select(
            s1.elem_type,
            "iri1",
            "iri2",
            F.lit("equivalence").alias("relation"),
            F.lit(rating).alias("rating"),
        )
    )

    # containment: overlap count == smaller side's distinct-lemma count
    e1, e2 = _exploded_lemmas(an1, 1), _exploded_lemmas(an2, 2)
    overlap = (
        e1.select("iri1", "elem_type", "n_tokens1", "passive1", "set_size1", "lemma")
        .distinct()
        .join(
            e2.select("iri2", "elem_type", "n_tokens2", "passive2", "set_size2", "lemma").distinct(),
            on=["elem_type", "lemma"],
        )
        .groupBy(
            "elem_type", "iri1", "iri2",
            "n_tokens1", "n_tokens2", "passive1", "passive2",
            "set_size1", "set_size2",
        )
        .agg(F.count("*").alias("n_overlap"))
        .filter(F.col("passive1").eqNullSafe(F.col("passive2")))
    )
    hypo = overlap.filter(
        (F.col("n_tokens2") < F.col("n_tokens1"))
        & (F.col("n_overlap") == F.col("set_size2"))
    ).select(
        "elem_type", "iri1", "iri2",
        F.lit("hyponym").alias("relation"), F.lit(rating).alias("rating"),
    )
    hyper = overlap.filter(
        (F.col("n_tokens1") < F.col("n_tokens2"))
        & (F.col("n_overlap") == F.col("set_size1"))
    ).select(
        "elem_type", "iri1", "iri2",
        F.lit("hypernym").alias("relation"), F.lit(rating).alias("rating"),
    )
    return eq.unionByName(hypo).unionByName(hyper)


def _expansion(an: DataFrame, alias_df: DataFrame, rel: str, n: int) -> DataFrame:
    """Per-element alias expansion (iri, alias, pos), identity included for
    'syn'. alias_df: (lemma, pos, rel, alias); broadcast — reference builds
    the same dictionaries per element at src/compare_by_labels.py:163-212."""
    ex = _exploded_lemmas(an, n)
    via_alias = ex.join(
        F.broadcast(alias_df.filter(F.col("rel") == rel).drop("rel")),
        on=["lemma", "pos"],
    ).select(f"iri{n}", "elem_type", F.col("alias"), "pos")
    if rel == "syn":
        identity = ex.select(f"iri{n}", "elem_type", F.col("lemma").alias("alias"), "pos")
        via_alias = via_alias.unionByName(identity)
    return via_alias.distinct()


def _coverage(
    expansion: DataFrame, other_exploded: DataFrame, n_from: int, n_to: int
) -> DataFrame:
    """Pairs (iri_from, iri_to) where EVERY lemma of side `n_to` appears in
    side `n_from`'s expansion with matching POS bucket."""
    tgt = other_exploded.select(
        f"iri{n_to}", "elem_type", f"set_size{n_to}", "lemma", "pos"
    ).distinct()
    covered = (
        expansion.join(
            tgt,
            on=[
                expansion["elem_type"] == tgt["elem_type"],
                expansion["alias"] == tgt["lemma"],
                expansion["pos"] == tgt["pos"],
            ],
        )
        .select(expansion["elem_type"], f"iri{n_from}", f"iri{n_to}", f"set_size{n_to}", "lemma")
        .distinct()
        .groupBy("elem_type", f"iri{n_from}", f"iri{n_to}", f"set_size{n_to}")
        .agg(F.count("*").alias("n_cov"))
        .filter(F.col("n_cov") == F.col(f"set_size{n_to}"))
        .select("elem_type", f"iri{n_from}", f"iri{n_to}")
    )
    return covered


def _op_features(an: DataFrame, n: int) -> DataFrame:
    """Root verb / noun presence features for OP implicit rules."""
    verbs = F.filter("lemmas", lambda t: t["pos"] == F.lit("VERB"))
    return an.filter(F.col("elem_type") == OP).select(
        F.col("iri").alias(f"iri{n}"),
        F.col("passive").alias(f"passive{n}"),
        F.col("n_tokens").alias(f"n_tokens{n}"),
        F.when(F.size(verbs) > 0, verbs[0]["lemma"]).alias(f"root_verb{n}"),
        F.size(verbs).alias(f"n_verbs{n}"),
        F.exists("lemmas", lambda t: t["pos"] == F.lit("NOUN")).alias(f"has_noun{n}"),
        F.filter("lemmas", lambda t: t["pos"].isin("ADJ", "ADV")).alias(f"mods{n}"),
        F.filter("lemmas", lambda t: t["pos"] == F.lit("NOUN")).alias(f"nouns{n}"),
    )


def implicit_compare(
    an1: DataFrame,
    an2: DataFrame,
    alias_df: DataFrame,
    vocab_df: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """WordNet-style implicit matching (reference :248-344).

    Produces prioritized candidates; per pair the highest-priority rule
    wins (mirrors the reference's if/elif cascade).
    """
    pri = cfg.semantic
    cands: list[DataFrame] = []

    def _mk(df: DataFrame, relation: str, rating: float, priority: int) -> DataFrame:
        return df.select(
            "elem_type", "iri1", "iri2",
            F.lit(relation).alias("relation"),
            F.lit(rating).alias("rating"),
            F.lit(priority).alias("_prio"),
        )

    # --- domain-vocabulary synsets (full normalized label) --------------
    v = F.broadcast(vocab_df)
    l1 = an1.select(F.col("iri").alias("iri1"), "elem_type", F.col("norm_label").alias("lab1"))
    l2 = an2.select(F.col("iri").alias("iri2"), "elem_type", F.col("norm_label").alias("lab2"))
    h1 = l1.join(v, l1.lab1 == v.label).select("iri1", "elem_type", F.col("synset_id").alias("sid1"))
    h2 = l2.join(v, l2.lab2 == v.label).select("iri2", "elem_type", F.col("synset_id").alias("sid2"))
    vocab_pairs = h1.join(h2, on="elem_type")
    cands.append(_mk(vocab_pairs.filter(F.col("sid1") == F.col("sid2")),
                     "equivalence", pri.domain_specific, 1))
    cands.append(_mk(vocab_pairs.filter(F.col("sid1") != F.col("sid2")),
                     "disjoint", pri.domain_specific, 2))

    # --- synonym equivalence (mutual coverage, passive-consistent) ------
    e1, e2 = _exploded_lemmas(an1, 1), _exploded_lemmas(an2, 2)
    syn1 = _expansion(an1, alias_df, "syn", 1)
    syn2 = _expansion(an2, alias_df, "syn", 2)
    cov_2_by_1 = _coverage(syn1, e2, 1, 2)
    cov_1_by_2 = _coverage(syn2, e1, 2, 1)
    p1 = an1.select(F.col("iri").alias("iri1"), F.col("passive").alias("passive1"))
    p2 = an2.select(F.col("iri").alias("iri2"), F.col("passive").alias("passive2"))
    syn_eq = (
        cov_2_by_1.join(cov_1_by_2, on=["elem_type", "iri1", "iri2"])
        .join(p1, "iri1").join(p2, "iri2")
        .filter(F.col("passive1").eqNullSafe(F.col("passive2")))
    )
    cands.append(_mk(syn_eq, "equivalence", pri.implicit_syn, 3))

    # --- derivationally-related reified OPs ------------------------------
    # noun-only side's agent noun derives the other side's root verb;
    # same passive flag -> equivalence, differing -> inverse
    # (reference :291-296 and :323-328)
    f1, f2 = _op_features(an1, 1), _op_features(an2, 2)
    drf = F.broadcast(alias_df.filter(F.col("rel") == "drf").drop("rel"))
    for a_feats, b_feats, flip in ((f1, f2, False), (f2, f1, True)):
        na, nb = (1, 2) if not flip else (2, 1)
        noun_side = (
            a_feats.filter(F.col(f"has_noun{na}") & (F.col(f"n_verbs{na}") == 0))
            .select(f"iri{na}", f"passive{na}", F.explode(f"nouns{na}").alias("tok"))
            .join(drf, drf.lemma == F.col("tok.lemma"))
            .select(f"iri{na}", f"passive{na}", F.col("alias").alias("drf_verb"))
        )
        verb_side = b_feats.filter(
            (F.col(f"n_verbs{nb}") > 0) & ~F.col(f"has_noun{nb}")
        ).select(f"iri{nb}", f"passive{nb}", f"root_verb{nb}")
        joined = noun_side.join(
            verb_side, noun_side.drf_verb == verb_side[f"root_verb{nb}"]
        ).withColumn("elem_type", F.lit(OP))
        same = joined.filter(F.col(f"passive{na}").eqNullSafe(F.col(f"passive{nb}")))
        diff = joined.filter(~F.col(f"passive{na}").eqNullSafe(F.col(f"passive{nb}")))
        cands.append(_mk(same, "equivalence", pri.implicit_syn, 4))
        cands.append(_mk(diff, "inverse", pri.implicit_ant, 7))

    # --- antonym disjoint for classes / DPs ------------------------------
    ant1 = _expansion(an1, alias_df, "ant", 1)
    e2_toks = e2.select("iri2", "elem_type", "lemma", "pos").distinct()
    ant_pairs = (
        ant1.join(
            e2_toks,
            on=[
                ant1["elem_type"] == e2_toks["elem_type"],
                ant1["alias"] == e2_toks["lemma"],
                ant1["pos"] == e2_toks["pos"],
            ],
        )
        .select(ant1["elem_type"], "iri1", "iri2")
        .distinct()
    )
    cands.append(_mk(ant_pairs.filter(F.col("elem_type").isin(CLS, DP)),
                     "disjoint", pri.implicit_ant, 5))

    # --- OP rules: antonym/synonym root verbs ----------------------------
    syn1_v = syn1.filter((F.col("pos") == "VERB") & (F.col("elem_type") == OP))
    ant1_v = ant1.filter((F.col("pos") == "VERB") & (F.col("elem_type") == OP))
    f2_root = f2.filter(F.col("n_verbs2") == 1)
    # disjoint: root verb of side2 is an antonym of side1's verbs
    op_dis = ant1_v.join(f2_root, ant1_v["alias"] == f2_root["root_verb2"]).select(
        F.lit(OP).alias("elem_type"), "iri1", "iri2"
    )
    cands.append(_mk(op_dis, "disjoint", pri.implicit_ant, 6))
    # inverse: passive XOR with synonymous root verbs
    syn_pairs_v = syn1_v.join(f2_root, syn1_v["alias"] == f2_root["root_verb2"]).join(
        f1.select("iri1", "passive1"), "iri1"
    )
    op_inv = syn_pairs_v.filter(
        F.col("passive1").isNotNull()
        & F.col("passive2").isNotNull()
        & (F.col("passive1") != F.col("passive2"))
    ).select(F.lit(OP).alias("elem_type"), "iri1", "iri2")
    cands.append(_mk(op_inv, "inverse", pri.implicit_ant, 7))

    # --- implicit subsumption via hypernym+synonym coverage (cls/DP) -----
    hype1 = _expansion(an1, alias_df, "hype", 1).unionByName(syn1)
    hype2 = _expansion(an2, alias_df, "hype", 2).unionByName(syn2)
    sz1 = an1.select(F.col("iri").alias("iri1"), F.col("n_tokens").alias("n_tokens1"))
    sz2 = an2.select(F.col("iri").alias("iri2"), F.col("n_tokens").alias("n_tokens2"))
    hypo = (
        _coverage(hype1, e2, 1, 2)
        .join(sz1, "iri1").join(sz2, "iri2")
        .filter((F.col("n_tokens2") <= F.col("n_tokens1")) & F.col("elem_type").isin(CLS, DP))
    )
    hyper = (
        _coverage(hype2, e1, 2, 1)
        .join(sz1, "iri1").join(sz2, "iri2")
        .filter((F.col("n_tokens1") <= F.col("n_tokens2")) & F.col("elem_type").isin(CLS, DP))
    )
    cands.append(_mk(hypo, "hyponym", pri.implicit_ant, 8))
    cands.append(_mk(hyper, "hypernym", pri.implicit_ant, 9))

    # --- pick the highest-priority rule per pair --------------------------
    all_cands = cands[0]
    for c in cands[1:]:
        all_cands = all_cands.unionByName(c)
    w = Window.partitionBy("elem_type", "iri1", "iri2").orderBy("_prio")
    return (
        all_cands.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(*MATCH_COLS)
    )


def lexical_match(
    an1: DataFrame,
    an2: DataFrame,
    alias_df: DataFrame,
    vocab_df: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Explicit + implicit matches, contradiction-pruned (reference :377-388)."""
    from prom_spark.operators.contradictions import reduce_vector

    explicit = explicit_compare(an1, an2, cfg.semantic.explicit)
    implicit = implicit_compare(an1, an2, alias_df, vocab_df, cfg)
    return reduce_vector(explicit.unionByName(implicit))
