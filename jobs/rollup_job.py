"""spark-submit entry point for the rollup pipeline.

Launch (BASELINE.json:14 — ``spark-submit --py-files`` on a cluster)::

    cd /root/repo && zip -qr /tmp/engine.zip pyreshaper_spark
    spark-submit --master local[32] --py-files /tmp/engine.zip \
        jobs/rollup_job.py --config run.json --checkpoint ckpt.json

``run.json`` is a serialized RunConfig (the ``.s2s`` Specifier analog);
re-running with the same checkpoint resumes from the last committed
step. On a real cluster only ``--master``/executor flags change — the
job code is identical at N and 4N executors.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True, help="RunConfig JSON path")
    ap.add_argument("--checkpoint", required=True, help="driver checkpoint JSON")
    ap.add_argument("--stop-after", default=None, help="test hook: stop after step")
    args = ap.parse_args(argv)

    from pyreshaper_spark.config import RunConfig
    from pyreshaper_spark.plans.pipeline import diagnostics, run_pipeline

    cfg = RunConfig.read(args.config)
    spark = (
        SparkSession.builder.appName("pyreshaper-spark-rollup")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    result = run_pipeline(spark, cfg, args.checkpoint, stop_after=args.stop_after)
    print(f"steps run: {result.steps_run}")
    print(f"steps skipped (already committed): {result.steps_skipped}")
    if "encode" in result.steps_run or "encode" in result.steps_skipped:
        diagnostics(spark, cfg).show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
