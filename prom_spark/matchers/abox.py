"""ABox (individual) matching.

Distributed re-expression of the reference's AboxMatcher
(reference src/abox_matcher.py:49-271):

  - blocking by TBox-aligned class pairs, with subclass-unique filtering
    (reference :185-209) — individuals of an aligned subclass are
    excluded from the superclass block;
  - name similarity: normalized Levenshtein within blocks (:230-259);
  - structural similarity: DP value-set vectors compared with the
    binary-cosine subsumption rule (1 / 0.5 / 0 per dimension, :104-122)
    and OP in/out degree vectors with zero-dim-dropping cosine (:97-102),
    weighted .4/.3/.3 (:175, config.yml:26-30);
  - full-outer weighted combine (.2 label / .8 structure) + greedy 1:1
    selection at the overall threshold (:211-228).

Every per-individual vector is a (individual, dimension) long-format
join against the aligned property pairs — vectors never materialize,
which is what lets the same code run on 10^9 individuals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prom_spark.config import DEFAULT_CONFIG, PipelineConfig
from prom_spark.functions.similarity import norm_levenshtein
from prom_spark.matchers.lexical import CLS, OP, DP
from prom_spark.operators.selection import greedy_one_to_one

_POS_RELS = ["equivalence", "hypernym", "hyponym"]


def subclass_closure(class_axioms: DataFrame, max_depth: int = 12) -> DataFrame:
    """(descendant, ancestor) strict transitive closure from subclass
    axioms (rows with rel='subclass', prop null, obj = parent class)."""
    direct = (
        class_axioms.filter(
            (F.col("rel") == "subclass") & F.col("prop").isNull() & F.col("obj").isNotNull()
        )
        .select(F.col("subj").alias("descendant"), F.col("obj").alias("ancestor"))
        .distinct()
    )
    closure = direct
    frontier = direct
    for _ in range(max_depth):
        nxt = (
            frontier.alias("f")
            .join(direct.alias("d"), F.col("f.ancestor") == F.col("d.descendant"))
            .select(F.col("f.descendant").alias("descendant"), F.col("d.ancestor").alias("ancestor"))
            .distinct()
            .join(closure, on=["descendant", "ancestor"], how="left_anti")
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.count() == 0:
            break
        closure = closure.unionByName(nxt)
        frontier = nxt
    return closure


def _instances_of(individuals: DataFrame, closure: DataFrame) -> DataFrame:
    """(class_iri -> ind) including instances of descendants."""
    direct = individuals.select(F.col("class_iri").alias("cls"), "ind")
    via_desc = (
        individuals.join(
            closure, individuals.class_iri == closure.descendant
        ).select(F.col("ancestor").alias("cls"), "ind")
    )
    return direct.unionByName(via_desc).distinct()


def _blocked_pairs(
    inds1: DataFrame,
    inds2: DataFrame,
    class_ax1: DataFrame,
    class_ax2: DataFrame,
    aligned_classes: DataFrame,
) -> DataFrame:
    """Candidate individual pairs per aligned class pair, with
    subclass-unique filtering on both sides."""
    cl1 = subclass_closure(class_ax1)
    cl2 = subclass_closure(class_ax2)
    inst1 = _instances_of(inds1, cl1)
    inst2 = _instances_of(inds2, cl2)
    ac = aligned_classes.select(
        F.col("iri1").alias("c1"), F.col("iri2").alias("c2")
    ).distinct()

    def unique_side(inst: DataFrame, closure: DataFrame, aligned: DataFrame, ckey: str) -> DataFrame:
        # (cls, ind) pairs where ind is NOT an instance of an aligned
        # strict descendant of cls
        owned_by_sub = (
            inst.withColumnRenamed("cls", "subcls")
            .join(closure, F.col("subcls") == closure.descendant)
            .join(aligned, F.col("subcls") == aligned[ckey], "left_semi")
            .select(F.col("ancestor").alias("cls"), "ind")
            .distinct()
        )
        return inst.join(owned_by_sub, on=["cls", "ind"], how="left_anti")

    u1 = unique_side(inst1, cl1, ac, "c1").withColumnRenamed("cls", "c1").withColumnRenamed("ind", "ind1")
    u2 = unique_side(inst2, cl2, ac, "c2").withColumnRenamed("cls", "c2").withColumnRenamed("ind", "ind2")
    return (
        ac.join(u1, on="c1").join(u2, on="c2").select("ind1", "ind2").distinct()
    )


def _frag(col: str) -> F.Column:
    return F.substring_index(F.col(col), "#", -1)


def abox_scores(
    individuals1: DataFrame,
    individuals2: DataFrame,
    prop_values1: DataFrame,
    prop_values2: DataFrame,
    tbox_alignment: DataFrame,
    class_ax1: DataFrame,
    class_ax2: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Scored candidate pairs (ind1, ind2, rating) before 1:1 selection."""
    ab = cfg.abox
    aligned_classes = tbox_alignment.filter(
        (F.col("elem_type") == CLS) & F.col("relation").isin(*_POS_RELS)
    )
    pairs = _blocked_pairs(
        individuals1, individuals2, class_ax1, class_ax2, aligned_classes
    ).localCheckpoint(eager=False)

    # --- name similarity --------------------------------------------------
    name_scores = pairs.withColumn(
        "str_rating", norm_levenshtein(_frag("ind1"), _frag("ind2"))
    )

    # --- DP value-vector similarity ---------------------------------------
    dp_dims = (
        tbox_alignment.filter(F.col("elem_type") == DP)
        .select(F.col("iri1").alias("dp1"), F.col("iri2").alias("dp2"))
        .distinct()
    )
    vals1 = (
        prop_values1.filter("is_dp")
        .groupBy(F.col("subj").alias("ind1"), F.col("prop").alias("dp1"))
        .agg(F.sort_array(F.collect_list("obj")).alias("v1"))
    )
    vals2 = (
        prop_values2.filter("is_dp")
        .groupBy(F.col("subj").alias("ind2"), F.col("prop").alias("dp2"))
        .agg(F.sort_array(F.collect_list("obj")).alias("v2"))
    )
    # populated (pair, dimension) cells ONLY: each side's value table is
    # dimension-tagged (broadcast join against the tiny dim list), joined
    # to the candidate pairs on its own individual key, and the two sides
    # are merged full-outer on the dim key. The |pairs| x |dims| grid
    # never materializes — the empty cells the old crossJoin generated
    # and then null-filtered simply never exist, which is what lets the
    # same code run at 10^9 individuals x dozens of aligned properties.
    v1d = vals1.join(F.broadcast(dp_dims), on="dp1")
    v2d = vals2.join(F.broadcast(dp_dims), on="dp2")
    cells = (
        pairs.join(v1d, on="ind1")
        .join(
            pairs.join(v2d, on="ind2"),
            on=["ind1", "ind2", "dp1", "dp2"],
            how="full_outer",
        )
    )
    dp_scored = (
        cells
        .withColumn(
            "b",
            F.when(F.col("v1").isNull() | F.col("v2").isNull(), F.lit(0.0))
            .when(F.col("v1") == F.col("v2"), F.lit(1.0))
            .when(
                F.size(F.array_except("v1", "v2")) == 0, F.lit(0.5)
            )  # v1 subset of v2
            .when(F.size(F.array_except("v2", "v1")) == 0, F.lit(0.5))
            .otherwise(F.lit(0.0)),
        )
        .groupBy("ind1", "ind2")
        .agg(
            F.count("*").alias("n"),
            F.sum("b").alias("sb"),
            F.sum(F.col("b") * F.col("b")).alias("sb2"),
        )
        .withColumn(
            "dp_sim",
            F.when(
                (F.col("n") >= ab.op_threshold) & (F.col("sb2") > 0),
                F.col("sb") / (F.sqrt(F.col("n")) * F.sqrt(F.col("sb2"))),
            ).otherwise(F.lit(0.0)),
        )
        .select("ind1", "ind2", "dp_sim")
    )

    # --- OP degree-vector similarity ---------------------------------------
    op_dims = (
        tbox_alignment.filter(F.col("elem_type") == OP)
        .select(F.col("iri1").alias("op1"), F.col("iri2").alias("op2"))
        .distinct()
    )

    def degree(pv: DataFrame, key: str, prop_alias: str, ind_alias: str) -> DataFrame:
        return (
            pv.filter(~F.col("is_dp"))
            .groupBy(F.col(key).alias(ind_alias), F.col("prop").alias(prop_alias))
            .agg(F.count("*").alias("deg"))
        )

    def op_component(deg1: DataFrame, deg2: DataFrame, out_name: str) -> DataFrame:
        # same populated-cells-only shape as the DP scoring above
        d1d = deg1.join(F.broadcast(op_dims), on="op1")
        d2d = deg2.join(F.broadcast(op_dims), on="op2")
        cells = (
            pairs.join(d1d, on="ind1")
            .join(
                pairs.join(d2d, on="ind2"),
                on=["ind1", "ind2", "op1", "op2"],
                how="full_outer",
            )
        )
        return (
            cells
            .withColumn("d1", F.coalesce(F.col("deg1"), F.lit(0)).cast("double"))
            .withColumn("d2", F.coalesce(F.col("deg2"), F.lit(0)).cast("double"))
            .groupBy("ind1", "ind2")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("d1") * F.col("d2")).alias("dot"),
                F.sum(F.col("d1") * F.col("d1")).alias("n1"),
                F.sum(F.col("d2") * F.col("d2")).alias("n2"),
            )
            .withColumn(
                out_name,
                F.when(
                    (F.col("n") >= ab.op_threshold)
                    & (F.col("n1") > 0)
                    & (F.col("n2") > 0),
                    F.col("dot") / (F.sqrt("n1") * F.sqrt("n2")),
                ).otherwise(F.lit(0.0)),
            )
            .select("ind1", "ind2", out_name)
        )

    out1 = degree(prop_values1, "subj", "op1", "ind1").withColumnRenamed("deg", "deg1")
    out2 = degree(prop_values2, "subj", "op2", "ind2").withColumnRenamed("deg", "deg2")
    in1 = degree(prop_values1, "obj", "op1", "ind1").withColumnRenamed("deg", "deg1")
    in2 = degree(prop_values2, "obj", "op2", "ind2").withColumnRenamed("deg", "deg2")
    opo = op_component(out1, out2, "opo_sim")
    opi = op_component(in1, in2, "opi_sim")

    # --- weighted combine + selection --------------------------------------
    struct = (
        pairs.join(dp_scored, on=["ind1", "ind2"], how="left")
        .join(opo, on=["ind1", "ind2"], how="left")
        .join(opi, on=["ind1", "ind2"], how="left")
        .withColumn(
            "struct_rating",
            ab.dp * F.coalesce("dp_sim", F.lit(0.0))
            + ab.op_outgoing * F.coalesce("opo_sim", F.lit(0.0))
            + ab.op_incoming * F.coalesce("opi_sim", F.lit(0.0)),
        )
        .select("ind1", "ind2", "struct_rating")
    )
    return (
        name_scores.select("ind1", "ind2", "str_rating")
        .join(struct, on=["ind1", "ind2"], how="full_outer")
        .withColumn(
            "rating",
            ab.label * F.coalesce("str_rating", F.lit(0.0))
            + ab.structure * F.coalesce("struct_rating", F.lit(0.0)),
        )
        .select("ind1", "ind2", "rating")
    )


def abox_match(
    individuals1: DataFrame,
    individuals2: DataFrame,
    prop_values1: DataFrame,
    prop_values2: DataFrame,
    tbox_alignment: DataFrame,
    class_ax1: DataFrame,
    class_ax2: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Full individual matching; returns selected (ind1, ind2, rating)."""
    combined = abox_scores(
        individuals1, individuals2, prop_values1, prop_values2,
        tbox_alignment, class_ax1, class_ax2, cfg,
    )
    return greedy_one_to_one(
        combined, uid1_col="ind1", uid2_col="ind2",
        threshold=cfg.abox.overall_threshold,
    )
