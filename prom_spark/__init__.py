"""prom_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the capabilities of felixocker/prom
(ontology merging: lexical label matching, structural/taxonomic scoring,
1:1 alignment selection, merge-and-canonicalize) as a distributed
DataFrame pipeline over tables of multi-turn conversation transcripts.

Nothing here is a port: the reference is single-process, row-at-a-time
Python over owlready2 object graphs; this engine declares every stage as
Spark SQL / DataFrame transformations so Catalyst + Tungsten pick the
physical plan, with explicit partitioning/broadcast/salting decisions
where the optimizer cannot infer them.

Layout:
    session      SparkSession factory tuned for the pipeline
    config       thresholds/weights mirroring the reference's config.yml
    datagen      deterministic synthetic transcript/alias-dict generators
    fixtures     reference-parity ontology fixtures as DataFrames
    functions/   scalar similarity + text expressions (JVM-side)
    operators/   selection, dedup (minhash/simhash/...), ANN, conn.components
    matchers/    string / lexical / structural / abox matchers
    pipeline/    end-to-end transcripts -> triples KG construction
"""

__version__ = "0.1.0"
