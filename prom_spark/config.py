"""Pipeline configuration.

Mirrors the semantics of the reference's config (thresholds, rating
priors, weightings — reference: src/config.yml:1-77) as a plain frozen
dataclass. Weights become literal columns in score expressions; nothing
is read from disk at executor time.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class SemanticPriors:
    """Rating priors for lexical matches (reference: src/config.yml:46-52)."""

    explicit: float = 0.9          # identical lemma multisets
    domain_specific: float = 0.8   # same domain-vocabulary synset
    implicit_syn: float = 0.7      # synonym-dictionary equivalence
    implicit_ant: float = 0.6      # antonym/hyper-/hyponym evidence
    boundary: float = 0.6          # semantic candidate cutoff


@dataclass(frozen=True)
class StructuralPriors:
    """Weights for structural similarity (reference: src/config.yml:53-77)."""

    dp_domain: float = 0.3
    dp_range: float = 0.3
    dp_interval: float = 0.3
    dp_functional: float = 0.1
    interval_equivalence: float = 1.0
    interval_overlap: float = 0.7
    dp_boundary: float = 0.8
    op_domain: float = 1.0
    op_range: float = 1.0
    op_attributes: float = 1.0
    op_boundary: float = 0.8
    sem_weight: float = 1.0        # semantic vs structural combine weights
    struct_weight: float = 1.0
    class_sem_boundary: float = 0.6


@dataclass(frozen=True)
class AboxWeights:
    """Individual-matching weights (reference: src/config.yml:18-30)."""

    string_threshold: float = 0.95
    overall_threshold: float = 0.1
    label: float = 0.2
    structure: float = 0.8
    dp: float = 0.4
    op_outgoing: float = 0.3
    op_incoming: float = 0.3
    op_threshold: int = 1


@dataclass(frozen=True)
class PipelineConfig:
    """Top-level knobs for the KG-construction pipeline."""

    accept_threshold: float = 0.6   # auto-accept band (reference: config.yml:14)
    reject_threshold: float = 0.3   # below -> drop  (reference: config.yml:15)
    match_boundary: float = 0.6
    semantic: SemanticPriors = field(default_factory=SemanticPriors)
    structural: StructuralPriors = field(default_factory=StructuralPriors)
    abox: AboxWeights = field(default_factory=AboxWeights)
    # entity-link scoring ensemble weights (new pipeline, north_star:
    # "string-similarity + embedding-cosine ensemble")
    link_string_weight: float = 0.5
    link_embedding_weight: float = 0.5
    link_threshold: float = 0.6
    # skew handling: aliases whose mention count exceeds this factor times
    # the mean get salted into this many sub-keys; detection counts a
    # deterministic sample of the mention stream (hot keys are visible in
    # any small sample; the threshold is scale-free)
    hot_key_salts: int = 8
    hot_key_factor: float = 10.0
    hot_key_sample: float = 0.05
    embedding_dim: int = 16
    # broadcast budgets. dict_broadcast_limit: dictionaries (WITH embedding
    # payloads) above this row count switch the exact link join from
    # broadcast to salted shuffle. alias_broadcast_limit: above this row
    # count even the bare alias-string set is too large to broadcast for
    # the semi-join reduction, and the semi-reduction itself falls back to
    # a salted shuffle semi-join (strings only, no payload).
    dict_broadcast_limit: int = 2_000_000
    alias_broadcast_limit: int = 20_000_000
    # match-key sets at or under this size are inlined as an InSet
    # predicate INSIDE the mention arrays (candidate grams filtered
    # before the explode ever runs — measured 2.5x faster than exploding
    # the full mention stream through a broadcast semi-join, because only
    # matching grams are materialized as rows). Above it, the explode +
    # broadcast/salted semi-join paths take over: a giant InSet literal
    # bloats the plan, and the driver should not collect unbounded keys.
    inline_keyset_limit: int = 65_536
    # hash(conv_id) bucket count for the ingest/triples layouts. Size to
    # the deployment: target <= ~1 GB of parquet per bucket, so sf0.1
    # local runs use the 32 default while a 10^12-turn corpus (~100 TB)
    # wants ~10^5 buckets — and the bucket count then also bounds write
    # parallelism, so keep it >= the executor count.
    n_output_buckets: int = 32
    # write-balancing sub-split gate: the bucketed-layout shuffle key is
    # sub-split (bounding the longest write task when buckets ~ cores —
    # the balls-in-bins straggler) only when the stage holds at least
    # this many rows PER BUCKET. Below it a bucket's write is too short
    # to straggle and the split just multiplies per-file overhead
    # (measured ~6s of a ~27s flagship wall at 120k turns vs a 0.11->0.8
    # write-stage efficiency gain at 3.6M turns).
    sub_split_min_bucket_rows: int = 50_000


DEFAULT_CONFIG = PipelineConfig()
