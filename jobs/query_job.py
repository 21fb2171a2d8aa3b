"""spark-submit entry point for tier-routed rollup queries — the
serving face of the continuous-aggregate cascade.

    spark-submit --py-files /tmp/engine.zip jobs/query_job.py \
        --config run.json --width 1800 --sources src1 src2 \
        --from 1704240000 --to 1704412800 --realtime --out /tmp/ans

Routes the requested bucket width to the coarsest committed tier that
divides it (sql.read_rollup), prunes by source partitions and per-file
bucket stats at planning time, and with ``--realtime`` merges the
not-yet-ingested raw tail so answers are fresh between pipeline runs.
Without ``--out`` the result prints as one JSON line per bucket row
(sorted), which is how the tests drive it.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True, help="RunConfig JSON path")
    ap.add_argument("--width", type=int, required=True,
                    help="requested bucket width in seconds")
    ap.add_argument("--sources", nargs="*", default=None)
    ap.add_argument("--from", dest="t_min", type=int, default=None,
                    help="inclusive bucket lower bound (epoch s, "
                    "width-aligned)")
    ap.add_argument("--to", dest="t_max", type=int, default=None,
                    help="exclusive bucket upper bound (epoch s, "
                    "width-aligned)")
    ap.add_argument("--realtime", action="store_true",
                    help="merge the not-yet-ingested raw tail")
    ap.add_argument("--out", default=None,
                    help="write result parquet here instead of printing")
    args = ap.parse_args(argv)

    from pyreshaper_spark.config import RunConfig
    from pyreshaper_spark.sql import read_rollup

    cfg = RunConfig.read(args.config)
    spark = (
        SparkSession.builder.appName("pyreshaper-spark-query")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    df = read_rollup(
        spark, cfg, args.width,
        sources=args.sources, t_min=args.t_min, t_max=args.t_max,
        realtime=args.realtime,
    )
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        return 0
    for r in sorted(df.collect()):
        print(json.dumps(r.asDict(), sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
