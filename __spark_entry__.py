"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: reshape sf0.001 documents into the transcript
                schema (input_hint), run the full KG-construction
                pipeline (mention detection -> salted entity linking ->
                predicate extraction -> connected-components
                canonicalization), return the triple table.
queries()     — one entry per implemented operator from SURVEY.md §2
                plus the training-data-pipeline extras (dedup, ANN,
                text analysis), each over the driver testdata tables.
oracle_sql()  — DuckDB twins for ALL 50 entries (exactly 50 so the
                driver's correctness window reaches every operator;
                q04/q05, q16/q17 and q21/q53/q54 are merged gates, and
                the retired q10/q20 keep their oracle check in
                tests/test_retired_entries.py) (see
                prom_spark/queries.py for the exactness rules: decimal
                aggregates cast to rounded doubles on both engines,
                round(x, 6) similarity scores, md5 hashing; recursive
                CTEs twin the iterative ops, prom_spark/oracle_golden.py
                twins the golden alignment chain).
"""

from __future__ import annotations

import tempfile

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from prom_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from prom_spark.pipeline.kg import (
        build_kg,
        term_dictionary,
        transcripts_from_documents,
    )
    from prom_spark.queries import LINK_TERMS

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    transcripts = transcripts_from_documents(docs)
    dictionary = term_dictionary(spark, LINK_TERMS)
    base = tempfile.mkdtemp(prefix="prom_spark_entry_")
    result = build_kg(spark, transcripts, dictionary, base, resume=False)
    # fixed column order: the published layout's bucket column is an
    # implementation detail of the parquet partitioning, and triples_raw's
    # natural order changed when the final re-layout stage became an alias
    return result.triples.select("subj", "pred", "obj", "conv_id", "turn_idx")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
