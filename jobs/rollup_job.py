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
import json
import sys
import time

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True, help="RunConfig JSON path")
    ap.add_argument("--checkpoint", required=True, help="driver checkpoint JSON")
    ap.add_argument("--stop-after", default=None, help="test hook: stop after step")
    ap.add_argument(
        "--emit-timing", action="store_true",
        help="print one TIMING json line (pipeline wall time, excl. session start)",
    )
    ap.add_argument(
        "--bench-runs", type=int, default=1,
        help="run the pipeline N times to fresh outputs and report the last "
        "(steady-state) wall time — JVM/JIT/page-cache warm-up is a per-app "
        "constant, not part of sustained throughput",
    )
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
    walls = []
    step_walls = []  # per-run step breakdown, parallel to walls — the
    # reported step_wall_s must describe the RUN whose wall is chosen,
    # not whichever run happened to finish last
    for i in range(max(args.bench_runs - 1, 0)):
        warm_cfg = cfg.with_(output_path=f"{cfg.output_path}_warm{i}")
        t0 = time.perf_counter()
        r = run_pipeline(spark, warm_cfg, f"{args.checkpoint}.warm{i}")
        walls.append(round(time.perf_counter() - t0, 3))
        step_walls.append(r.step_wall_s)
    t0 = time.perf_counter()
    result = run_pipeline(spark, cfg, args.checkpoint, stop_after=args.stop_after)
    wall_s = time.perf_counter() - t0
    walls.append(round(wall_s, 3))
    step_walls.append(result.step_wall_s)
    print(f"steps run: {result.steps_run}")
    print(f"steps skipped (already committed): {result.steps_skipped}")
    if "encode" in result.steps_run or "encode" in result.steps_skipped:
        diagnostics(spark, cfg).show(truncate=False)
    if args.emit_timing:
        d = diagnostics(spark, cfg).collect()[0]
        from pyreshaper_spark.sources.catalog import get_catalog

        cat = get_catalog(cfg.output_path)
        tier_points = sum(
            cat.read(spark, f"tier_{t.name}").count() for t in cfg.tiers
        )
        print(
            "TIMING "
            + json.dumps(
                {
                    "wall_s": round(wall_s, 3),
                    "all_runs_wall_s": walls,
                    "step_wall_s": result.step_wall_s,
                    "all_runs_step_wall_s": step_walls,
                    "sequences": d["points"],
                    "tier_points": tier_points,
                    "enc_bytes": d["enc_bytes"],
                    "raw_bytes": d["raw_bytes"],
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
