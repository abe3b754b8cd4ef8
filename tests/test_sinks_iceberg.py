"""Iceberg sink path: probe, bucketed writeTo, parquet fallback."""

import pytest
from pyspark.sql import functions as F

from prom_spark.sinks import StageStore, iceberg_available, write_iceberg


def test_iceberg_writeto_path(spark, tmp_path):
    df = spark.range(8).select(
        F.col("id").cast("string").alias("conv_id"), F.col("id").alias("v")
    )
    if iceberg_available(spark):
        write_iceberg(df, "prom.stages.test_stage")
        assert spark.table("prom.stages.test_stage").count() == 8
    else:
        # no runtime jar in this container: the code path must fail
        # loudly (not write anywhere silently)
        with pytest.raises(Exception):
            write_iceberg(df, "prom.stages.test_stage")


def test_stage_store_records_fallback(spark, tmp_path):
    store = StageStore(spark, str(tmp_path))
    df = spark.range(4).select(F.col("id").cast("string").alias("conv_id"))
    store.write("s1", df, inputs=["x"])
    m = store.metrics("s1")
    assert m["rows"] == 4
    if not iceberg_available(spark):
        # parquet-only environment: no iceberg claim in the metrics
        assert "iceberg" not in m
