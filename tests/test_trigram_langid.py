"""Edge-case gates for the q31 trigram language-ID operator.

The DuckDB parity gate runs q31 on the fixed documents table; these
cover the branches that table never exercises: documents too short to
yield a trigram (the left-join/coalesce 'unk' path) and the
deterministic (score desc, lang asc) argmax tie-break.
"""

from __future__ import annotations

import os
import tempfile

from prom_spark.queries import q31_trigram_langid


def _write_docs(spark, rows, tmpdir):
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        "doc_id int, lang string, text string",
    )
    path = os.path.join(tmpdir, "documents.parquet")
    df.write.mode("overwrite").parquet(path)
    return tmpdir


def test_short_docs_predict_unk(spark):
    with tempfile.TemporaryDirectory() as d:
        _write_docs(
            spark,
            [
                (1, "en", "ab"),          # 2 chars: no trigram
                (2, "de", ""),            # empty
                (3, "fr", " \n\t "),      # whitespace-only -> normalizes to ""
                (4, "en", "abcd abcd abcd"),  # real trigrams
            ],
            d,
        )
        out = {r["doc_id"]: r for r in q31_trigram_langid(spark, d).collect()}
    assert out[1]["lang_pred"] == "unk" and out[1]["score"] == 0
    assert out[2]["lang_pred"] == "unk" and out[2]["score"] == 0
    assert out[3]["lang_pred"] == "unk" and out[3]["score"] == 0
    assert out[4]["lang_pred"] != "unk" and out[4]["score"] > 0


def test_argmax_tie_breaks_on_lang_asc(spark):
    # two languages with byte-identical corpora build identical profiles;
    # every scored doc ties across both and must resolve to the earlier
    # language name.
    with tempfile.TemporaryDirectory() as d:
        _write_docs(
            spark,
            [
                (1, "aa", "xyz xyz xyz"),
                (2, "bb", "xyz xyz xyz"),
            ],
            d,
        )
        rows = q31_trigram_langid(spark, d).collect()
    assert {r["lang_pred"] for r in rows} == {"aa"}
    scores = {r["doc_id"]: r["score"] for r in rows}
    assert scores[1] == scores[2] > 0


def test_doc_id_determines_lang_invariant(spark):
    """q31's single-scan rewrite projects doc_tris straight off the
    (doc_id, lang, tri) counts — equal to the oracle's DISTINCT
    (doc_id, tri) only while doc_id determines lang. Pin that invariant
    on the driver testdata the oracle comparison actually runs on."""
    import os

    import pyspark.sql.functions as F

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        if not os.path.isdir(sf_dir):
            continue
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        dup = (
            d.groupBy("doc_id")
            .agg(F.countDistinct("lang").alias("n_langs"))
            .filter(F.col("n_langs") > 1)
            .count()
        )
        assert dup == 0, f"{sf_dir}: {dup} doc_ids with >1 lang"
