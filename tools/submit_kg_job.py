#!/usr/bin/env python3
"""spark-submit entry point for the KG-construction pipeline.

Cluster deployment (north_rule: "launched via spark-submit --py-files"):

    python -c "from prom_spark.session import package_zip; print(package_zip())"
    spark-submit --py-files /tmp/prom_spark.zip \\
        --conf spark.sql.adaptive.enabled=true \\
        --conf spark.sql.shuffle.partitions=<2-3x total cores> \\
        tools/submit_kg_job.py \\
        --transcripts  <path or catalog.db.table> \\
        --dictionary   <path or catalog.db.table> \\
        --output       <stage-store base dir> \\
        [--resume] [--salting auto|on|off] [--hot-keys alias1,alias2,...]

Reads the transcript table (parquet path or, when the name contains no
"/", a catalog table — e.g. an Iceberg table), runs the full pipeline
with per-stage checkpoints under --output, and prints the triple-count
metrics line. Local smoke run:

    python tools/submit_kg_job.py --synthetic 1000 --output /tmp/kg_out
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load(spark, ref: str):
    return spark.table(ref) if "/" not in ref else spark.read.parquet(ref)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--transcripts", help="transcript table (path or catalog table)")
    ap.add_argument("--dictionary", help="alias dictionary (path or catalog table)")
    ap.add_argument("--output", required=True, help="stage-store base directory")
    ap.add_argument("--resume", action="store_true",
                    help="resume from existing stage checkpoints")
    ap.add_argument("--salting", choices=["auto", "on", "off"], default="auto",
                    help="dictionary join strategy: auto (default — broadcast "
                         "under the budget, salted shuffle above it), on "
                         "(force salted), off (force broadcast)")
    ap.add_argument("--hot-keys", default=None,
                    help="comma-separated known-hot aliases (skips detection pass)")
    ap.add_argument("--synthetic", type=int, default=None, metavar="N_CONVS",
                    help="generate N synthetic conversations instead of reading "
                         "--transcripts/--dictionary (smoke mode)")
    args = ap.parse_args()

    # under spark-submit the session (master, executors, confs) comes from
    # the submit command; get_spark only fills in engine-level defaults
    from prom_spark.session import get_spark

    spark = get_spark(app_name="prom_spark_kg")

    if args.synthetic:
        from prom_spark.datagen import entity_dictionary, synth_transcripts

        transcripts = synth_transcripts(spark, n_convs=args.synthetic)
        dictionary = entity_dictionary(spark, 256)
    else:
        if not (args.transcripts and args.dictionary):
            ap.error("--transcripts and --dictionary are required "
                     "(or use --synthetic)")
        transcripts = _load(spark, args.transcripts)
        dictionary = _load(spark, args.dictionary)

    from prom_spark.pipeline.kg import build_kg

    hot = args.hot_keys.split(",") if args.hot_keys else None
    result = build_kg(
        spark,
        transcripts,
        dictionary,
        args.output,
        resume=args.resume,
        use_salting={"auto": None, "on": True, "off": False}[args.salting],
        hot_keys=hot,
    )
    metrics = result.store.metrics("triples")
    # the stage set is whatever this run checkpointed under --output (works
    # on resume too), not a hard-coded list — stage names change across
    # pipeline versions (round 4 fused `linked` away entirely)
    try:
        stages = sorted(
            d for d in os.listdir(args.output)
            if os.path.exists(os.path.join(args.output, d, "metrics.json"))
        )
    except OSError:  # non-local stage store (hdfs://, s3a://)
        stages = sorted(result.store.lineage)
    print(json.dumps({
        "triples": metrics["rows"],
        "partitions": len(metrics.get("partitions", [])),
        "stages": {
            s: result.store.metrics(s).get("duration_sec") for s in stages
        },
        "output": args.output,
    }))


if __name__ == "__main__":
    main()
