"""spark-submit entry point for the corpus data-card report — the
release-readiness summary a dataset owner runs before shipping.

    spark-submit --py-files /tmp/engine.zip jobs/report_job.py \
        --docs /data/documents.parquet [--out /tmp/report]

Joins the one-scan per-source data card (docs, token mass, median
length, duplicate / quality / PII shares, majority language) with the
tokenizer-fertility panel. Without ``--out`` the report prints as one
JSON line per source (sorted) — how the tests drive it.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True,
                    help="documents parquet path (doc_id, text, source)")
    ap.add_argument("--out", default=None,
                    help="optional parquet output path")
    args = ap.parse_args(argv)

    from pyreshaper_spark.operators.text import (
        datacard_by_source,
        fertility_by_source,
    )
    from pyreshaper_spark.session import get_spark

    spark = SparkSession.getActiveSession() or get_spark("report-job")
    docs = spark.read.parquet(args.docs)
    card = datacard_by_source(docs)
    fert = fertility_by_source(docs).select(
        "source", "sum_tok", "chars_per_tok_ppm"
    )
    report = card.join(fert, "source")
    if args.out:
        report.write.mode("overwrite").parquet(args.out)
    else:
        for row in sorted(
            report.collect(), key=lambda r: r["source"]
        ):
            print(json.dumps(row.asDict(), default=str, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
