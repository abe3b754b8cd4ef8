"""Structural (axiom-based) scoring of candidate matches.

Distributed re-expression of the reference's compare_by_structure
("semi" mode, reference src/compare_by_structure.py:466-488):

  - OP similarity: characteristics bit-vector cosine + domain/range
    agreement through the accepted semantic class matches
    (reference :111-179), as pure CASE/array expressions after two
    equi-joins against the OP-axiom table (the reference does a linear
    scan per pair, :367-372).
  - DP similarity: interval overlap + domain/range + functional
    (reference :181-278).
  - class similarity: property-participation vectors compared with
    positive_sim (reference :308-338) — here a dimension-membership join
    instead of materialized 0/1 vectors, which at 10^12 scale avoids
    building |pairs| x |props| vectors entirely: only pairs sharing at
    least one dimension ever materialize.
  - semantic (+) structural blending 50/50 (reference :345-360, 373-386).

The class-match table used for domain/range checks is broadcast — it is
the reference's `class_vector` reused in every check (:284).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prom_spark.config import DEFAULT_CONFIG, PipelineConfig
from prom_spark.functions.similarity import cosine_sim, interval_overlap_sim
from prom_spark.matchers.lexical import MATCH_COLS, CLS, OP, DP

_POS_RELS = ["equivalence", "hypernym", "hyponym"]

_CHAR_COLS = [
    "functional", "inversefunctional", "symmetric", "asymmetric",
    "transitive", "reflexive", "irreflexive",
]


def _axioms_side(ax: DataFrame, key: str, n: int) -> DataFrame:
    """Suffix every column of an axiom table for side ``n``."""
    return ax.select(
        [F.col(key).alias(f"iri{n}")]
        + [F.col(c).alias(f"{c}{n}") for c in ax.columns if c not in (key, "onto")]
    )


def _domain_range_flags(
    pairs: DataFrame, class_sem: DataFrame, col1: str, col2: str, prefix: str
) -> DataFrame:
    """Attach `<prefix>_rel` in {equivalence, disjoint, null} for the class
    pair (pairs[col1], pairs[col2]) using the semantic class matches
    (reference domain_range_check, src/compare_by_structure.py:280-306).
    Direct IRI equality also counts as equivalence.
    """
    pos = F.broadcast(
        class_sem.filter(F.col("relation").isin(*_POS_RELS))
        .select(F.col("iri1").alias("_c1"), F.col("iri2").alias("_c2"))
        .distinct()
        .withColumn("_pos", F.lit(1))
    )
    dis = F.broadcast(
        class_sem.filter(F.col("relation") == "disjoint")
        .select(F.col("iri1").alias("_c1d"), F.col("iri2").alias("_c2d"))
        .distinct()
        .withColumn("_dis", F.lit(1))
    )
    cur = pairs.join(
        pos,
        on=[F.col(col1) == F.col("_c1"), F.col(col2) == F.col("_c2")],
        how="left",
    ).drop("_c1", "_c2")
    cur = cur.join(
        dis,
        on=[F.col(col1) == F.col("_c1d"), F.col(col2) == F.col("_c2d")],
        how="left",
    ).drop("_c1d", "_c2d")
    return cur.withColumn(
        f"{prefix}_rel",
        F.when(
            (F.col("_pos") == 1)
            | (F.col(col1).isNotNull() & (F.col(col1) == F.col(col2))),
            F.lit("equivalence"),
        ).when(F.col("_dis") == 1, F.lit("disjoint")),
    ).drop("_pos", "_dis")


def score_op_matches(
    op_matches: DataFrame,
    op_ax1: DataFrame,
    op_ax2: DataFrame,
    class_sem: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Blend OP semantic ratings with structural similarity.

    Only equivalence/hypernym/hyponym rows are re-scored; inverse and
    disjoint rows pass through (reference create_prop_vector :362-391).
    """
    st = cfg.structural
    pos_rows = op_matches.filter(F.col("relation").isin(*_POS_RELS))
    rest = op_matches.filter(~F.col("relation").isin(*_POS_RELS))

    a1 = _axioms_side(op_ax1, "op", 1)
    a2 = _axioms_side(op_ax2, "op", 2)
    j = pos_rows.join(a1, on="iri1", how="left").join(a2, on="iri2", how="left")

    vec = lambda n: F.array(  # noqa: E731
        *[F.when(F.col(f"{c}{n}").isNotNull(), 1.0).otherwise(0.0) for c in _CHAR_COLS]
    )
    j = j.withColumn("_v1", vec(1)).withColumn("_v2", vec(2))
    # disjoint characteristic combos: (sym,asym), (refl,irrefl),
    # (fn,trans), (invfn,trans) in either orientation (reference :117-123)
    combos = [(2, 3), (5, 6), (0, 4), (1, 4)]
    dis_flag = F.lit(False)
    for x, y in combos:
        dis_flag = dis_flag | (
            (F.element_at("_v1", x + 1) == 1.0) & (F.element_at("_v2", y + 1) == 1.0)
        ) | (
            (F.element_at("_v1", y + 1) == 1.0) & (F.element_at("_v2", x + 1) == 1.0)
        )
    j = j.withColumn("_char_disjoint", dis_flag)
    j = j.withColumn("_attr_sim", cosine_sim("_v1", "_v2"))

    j = _domain_range_flags(j, class_sem, "domain1", "domain2", "dom")
    j = _domain_range_flags(j, class_sem, "range1", "range2", "rng")

    struct_sim = F.when(
        F.col("_char_disjoint")
        | (F.col("dom_rel") == "disjoint")
        | (F.col("rng_rel") == "disjoint"),
        F.lit(0.0),
    ).otherwise(
        (
            F.col("_attr_sim") * st.op_attributes
            + F.when(F.col("dom_rel") == "equivalence", 1.0).otherwise(0.0) * st.op_domain
            + F.when(F.col("rng_rel") == "equivalence", 1.0).otherwise(0.0) * st.op_range
        )
        / (st.op_attributes + st.op_domain + st.op_range)
    )
    blended = j.withColumn(
        "rating",
        (F.col("rating") * st.sem_weight + struct_sim * st.struct_weight)
        / (st.sem_weight + st.struct_weight),
    ).select(*MATCH_COLS)
    return blended.unionByName(rest.select(*MATCH_COLS))


def score_dp_matches(
    dp_matches: DataFrame,
    dp_ax1: DataFrame,
    dp_ax2: DataFrame,
    class_sem: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Blend DP semantic ratings with structural similarity (reference
    calc_dp_sim :181-278)."""
    st = cfg.structural
    pos_rows = dp_matches.filter(F.col("relation").isin(*_POS_RELS))
    rest = dp_matches.filter(~F.col("relation").isin(*_POS_RELS))

    a1 = _axioms_side(dp_ax1, "dp", 1)
    a2 = _axioms_side(dp_ax2, "dp", 2)
    j = pos_rows.join(a1, on="iri1", how="left").join(a2, on="iri2", how="left")

    j = _domain_range_flags(j, class_sem, "domain1", "domain2", "dom")
    j = _domain_range_flags(j, class_sem, "range1", "range2", "rng")

    lo = lambda n: F.coalesce(F.col(f"minin{n}"), F.col(f"minex{n}"))  # noqa: E731
    hi = lambda n: F.coalesce(F.col(f"maxin{n}"), F.col(f"maxex{n}"))  # noqa: E731
    bounds_equal = (
        F.col("minin1").eqNullSafe(F.col("minin2"))
        & F.col("maxin1").eqNullSafe(F.col("maxin2"))
        & F.col("minex1").eqNullSafe(F.col("minex2"))
        & F.col("maxex1").eqNullSafe(F.col("maxex2"))
    )
    iv = interval_overlap_sim(
        lo(1), hi(1), lo(2), hi(2),
        equivalence_rating=st.interval_equivalence,
        overlap_rating=st.interval_overlap,
    )
    j = j.withColumn("_iv", iv)
    j = j.withColumn(
        "_iv_sim",
        F.when(bounds_equal, F.lit(st.interval_equivalence)).otherwise(F.col("_iv.sim")),
    ).withColumn("_iv_disjoint", ~bounds_equal & F.col("_iv.disjoint"))

    fn_sim = F.when(
        F.col("functional1").eqNullSafe(F.lit(True))
        & F.col("functional2").eqNullSafe(F.lit(True)),
        1.0,
    ).otherwise(0.0)

    denom = st.dp_interval + st.dp_domain + st.dp_range + st.dp_functional
    struct_sim = F.when(
        (F.col("dom_rel") == "disjoint") | F.col("_iv_disjoint"), F.lit(0.0)
    ).otherwise(
        (
            F.col("_iv_sim") * st.dp_interval
            + F.when(F.col("dom_rel") == "equivalence", 1.0).otherwise(0.0) * st.dp_domain
            + F.when(F.col("rng_rel") == "equivalence", 1.0).otherwise(0.0) * st.dp_range
            + fn_sim * st.dp_functional
        )
        / denom
    )
    blended = j.withColumn(
        "rating",
        (F.col("rating") * st.sem_weight + struct_sim * st.struct_weight)
        / (st.sem_weight + st.struct_weight),
    ).select(*MATCH_COLS)
    return blended.unionByName(rest.select(*MATCH_COLS))


def reduce_prop_vector(prop_matches: DataFrame) -> DataFrame:
    """Same-side duplicate pruning for property matches (reference
    reduce_prop_vector :393-405): for relations other than hypernym /
    hyponym / disjoint, a property may appear on each side only once
    (keep max rating); for the multi-valued relations only exact
    duplicates collapse."""
    from pyspark.sql import Window

    multi = F.col("relation").isin("hypernym", "hyponym", "disjoint")
    single_rows = prop_matches.filter(~multi)
    multi_rows = prop_matches.filter(multi)

    order = [F.col("rating").desc(), F.col("iri1"), F.col("iri2")]
    w1 = Window.partitionBy("elem_type", "relation", "iri1").orderBy(*order)
    w2 = Window.partitionBy("elem_type", "relation", "iri2").orderBy(*order)
    single_rows = (
        single_rows.withColumn("_r1", F.row_number().over(w1))
        .withColumn("_r2", F.row_number().over(w2))
        .filter((F.col("_r1") == 1) & (F.col("_r2") == 1))
        .drop("_r1", "_r2")
    )
    wm = Window.partitionBy("elem_type", "relation", "iri1", "iri2").orderBy(
        F.col("rating").desc()
    )
    multi_rows = (
        multi_rows.withColumn("_r", F.row_number().over(wm))
        .filter(F.col("_r") == 1)
        .drop("_r")
    )
    return single_rows.unionByName(multi_rows)


def score_class_matches(
    class_sem: DataFrame,
    class_ax1: DataFrame,
    class_ax2: DataFrame,
    prop_vector: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Class participation-vector scoring + 50/50 semantic blend.

    Dimensions are the positive property matches (reference
    create_class_vector :308-338). Instead of 0/1 vectors per pair, each
    side's (class, dimension, case) memberships are joined — pairs with
    zero shared dimensions never materialize (their positive_sim is 0).

    Returns rated class rows for ALL of {equivalence, hypernym, hyponym}
    on pairs with positive participation overlap, plus the semantic rows
    (any relation), each at (sem + struct) / 2 (reference combine_ratings
    :345-360, applied over the all-combos vector in semi mode :476-478).
    """
    st = cfg.structural
    dims = (
        prop_vector.filter(F.col("relation").isin(*_POS_RELS))
        .select(
            F.col("iri1").alias("prop1"),
            F.col("iri2").alias("prop2"),
            F.col("relation").alias("dim_rel"),
        )
        .distinct()
    )
    # membership: class participates in dimension as subject (case 0) or
    # object (case 1) of an axiom mentioning the dimension's property
    def member(ax: DataFrame, prop_col: str, n: int) -> DataFrame:
        subj = ax.select(F.col("subj").alias(f"cls{n}"), F.col("prop"), F.lit(0).alias("case"))
        obj = ax.filter(F.col("obj").isNotNull()).select(
            F.col("obj").alias(f"cls{n}"), F.col("prop"), F.lit(1).alias("case")
        )
        both = subj.unionByName(obj).filter(F.col("prop").isNotNull())
        return (
            both.join(F.broadcast(dims), on=both["prop"] == dims[prop_col])
            .select(f"cls{n}", "prop1", "prop2", "dim_rel", "case")
            .distinct()
        )

    m1 = member(class_ax1, "prop1", 1)
    m2 = member(class_ax2, "prop2", 2)
    sizes1 = m1.groupBy("cls1").agg(F.count("*").alias("n1"))
    sizes2 = m2.groupBy("cls2").agg(F.count("*").alias("n2"))
    both = (
        m1.join(m2, on=["prop1", "prop2", "dim_rel", "case"])
        .groupBy("cls1", "cls2")
        .agg(F.count("*").alias("n_both"))
        .join(sizes1, "cls1")
        .join(sizes2, "cls2")
        .withColumn(
            "possim",
            F.col("n_both")
            / F.greatest(F.lit(1), F.col("n1") + F.col("n2") - F.col("n_both")),
        )
        .select(
            F.col("cls1").alias("iri1"), F.col("cls2").alias("iri2"), "possim"
        )
    )
    struct_rows = both.crossJoin(
        F.broadcast(
            class_sem.sparkSession.createDataFrame(
                [(r,) for r in _POS_RELS], "relation string"
            )
        )
    ).withColumn("elem_type", F.lit(CLS))

    sem_rows = class_sem.select(
        "elem_type", "iri1", "iri2", "relation", F.col("rating").alias("sem")
    )
    combined = (
        struct_rows.join(sem_rows, on=["elem_type", "iri1", "iri2", "relation"], how="full_outer")
        .withColumn(
            "rating",
            (
                F.coalesce(F.col("sem"), F.lit(0.0)) * st.sem_weight
                + F.when(
                    F.col("relation").isin(*_POS_RELS),
                    F.coalesce(F.col("possim"), F.lit(0.0)),
                ).otherwise(0.0)
                * st.struct_weight
            )
            / (st.sem_weight + st.struct_weight),
        )
        .select(*MATCH_COLS)
    )
    return combined


def structural_match(
    semantic_matches: DataFrame,
    class_ax1: DataFrame,
    class_ax2: DataFrame,
    op_ax1: DataFrame,
    op_ax2: DataFrame,
    dp_ax1: DataFrame,
    dp_ax2: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    boundary: float = 0.01,
) -> DataFrame:
    """Semi-mode structural scoring over the semantic match vector
    (reference main(:466-488) with comparison_type='semi')."""
    from prom_spark.operators.contradictions import reduce_vector

    class_sem_all = semantic_matches.filter(F.col("elem_type") == CLS)
    # boundary-filtered class matches used for domain/range checks
    class_sem_checked = class_sem_all.filter(
        F.col("rating") >= cfg.structural.class_sem_boundary
    )

    op_scored = score_op_matches(
        semantic_matches.filter(F.col("elem_type") == OP),
        op_ax1, op_ax2, class_sem_checked, cfg,
    )
    dp_scored = score_dp_matches(
        semantic_matches.filter(F.col("elem_type") == DP),
        dp_ax1, dp_ax2, class_sem_checked, cfg,
    )
    prop_vector = reduce_prop_vector(op_scored.unionByName(dp_scored))
    prop_vector = prop_vector.localCheckpoint(eager=False)

    class_vector = score_class_matches(
        class_sem_all, class_ax1, class_ax2, prop_vector, cfg
    )
    matches = prop_vector.unionByName(class_vector)
    matches = matches.filter(F.col("rating") > boundary)
    return reduce_vector(matches)
