"""SparkSession factory.

Single place where execution-level knobs are set so tests, bench, and the
driver entry point all run with the same physical configuration.

Scale notes (targets a multi-executor cluster even though CI is local[N]):
  - AQE on: runtime coalescing + skew-join splitting for the candidate
    joins whose key distribution is Zipf by construction.
  - shuffle.partitions sized to cores locally; on a real cluster this is
    overridden by --conf at spark-submit time (the code never assumes a
    fixed partition count).
  - Arrow enabled: every Python-side stage is a vectorized pandas UDF
    (reference does row-at-a-time Python; we never do).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_PKG_PARENT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def package_zip() -> str:
    """Zip the prom_spark package for ``--py-files`` / ``addPyFile``.

    On a real cluster the deployment path is
    ``spark-submit --py-files prom_spark.zip job.py`` (north_rule);
    this helper builds the same artifact for programmatic use.
    """
    pkg_dir = os.path.join(_PKG_PARENT, "prom_spark")
    out = os.path.join(tempfile.gettempdir(), "prom_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, _PKG_PARENT))
    return out


def get_spark(
    app_name: str = "prom_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (fallback: all
    cores) so the bench harness can run the identical job at two
    parallelism levels to evidence scaling efficiency.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    # Python workers must be able to import prom_spark regardless of the
    # driver's cwd (pandas UDFs resolve the module by name on executors).
    # Locally PYTHONPATH covers it; cluster submits ship package_zip().
    existing = os.environ.get("PYTHONPATH", "")
    if _PKG_PARENT not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _PKG_PARENT + (os.pathsep + existing if existing else "")
        )
    if shuffle_partitions is None:
        try:
            n = int(master.split("[", 1)[1].rstrip("]"))
        except (IndexError, ValueError):
            n = os.cpu_count() or 8
        shuffle_partitions = max(8, n)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
