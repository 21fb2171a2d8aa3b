"""spark-submit entry point for config-driven data-quality checks —
the scheduled-audit face of ``operators.checks`` (run a declared rule
suite against any table, every night, fail the job on contract
violations)::

    cd /root/repo && zip -qr /tmp/engine.zip pyreshaper_spark
    spark-submit --master local[32] --py-files /tmp/engine.zip \
        jobs/dq_job.py --table data/documents.parquet \
            --rules rules.json [--strict] [--out verdicts.parquet]

The rule spec is declarative JSON — one object per rule::

    [
      {"rule": "not_null",   "column": "doc_id"},
      {"rule": "unique",     "column": "doc_id"},
      {"rule": "bounds",     "column": "doc_id", "lo": 0},
      {"rule": "length_min", "column": "text",   "n": 1, "tol": 5},
      {"rule": "matches",    "column": "source", "pattern": "^src[0-9]+$"},
      {"rule": "in_set",     "column": "lang",   "values": ["en", "de"]},
      {"rule": "sql",        "name": "chars_consistent",
       "violation": "n_chars != length(text)"}
    ]

``sql`` rules take ONE violation predicate evaluated verbatim by Spark
(no DuckDB twin in the CLI path — the oracle-checked entry points pair
every rule by hand; the CLI trusts Spark). The whole suite compiles to
a single scan regardless of rule count. Exit code: 0 when every rule
passes, 1 under ``--strict`` when any fails (the scheduler-visible
signal); verdicts always print as one JSON line and optionally land in
a parquet audit table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def rules_from_spec(spec: list[dict]) -> list:
    """Compile the JSON rule spec into checks.Rule objects."""
    from pyreshaper_spark.operators import checks

    out = []
    for i, r in enumerate(spec):
        kind = r.get("rule")
        tol = int(r.get("tol", 0))
        if kind == "not_null":
            out.append(checks.not_null(r["column"], tol=tol))
        elif kind == "unique":
            out.append(checks.unique(r["column"], tol=tol))
        elif kind == "bounds":
            out.append(
                checks.bounds(
                    r["column"], lo=r.get("lo"), hi=r.get("hi"), tol=tol
                )
            )
        elif kind == "length_min":
            out.append(checks.length_min(r["column"], int(r["n"]), tol=tol))
        elif kind == "matches":
            out.append(checks.matches(r["column"], r["pattern"], tol=tol))
        elif kind == "in_set":
            out.append(
                checks.in_set(r["column"], list(r["values"]), tol=tol)
            )
        elif kind == "sql":
            cond_sql = r["violation"]
            out.append(
                checks.expr_rule(
                    r.get("name", f"sql_rule_{i}"),
                    lambda cond_sql=cond_sql: F.expr(cond_sql),
                    cond_sql,
                    tol=tol,
                )
            )
        else:
            raise ValueError(f"unknown rule kind at index {i}: {kind!r}")
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True,
                    help="parquet path to audit")
    ap.add_argument("--rules", required=True,
                    help="JSON rule-spec path")
    ap.add_argument("--strict", action="store_true",
                    help="exit 1 if any rule fails")
    ap.add_argument("--out", default=None,
                    help="append verdict rows to this parquet path "
                         "(audit history)")
    args = ap.parse_args(argv)

    with open(args.rules) as f:
        spec = json.load(f)
    rules = rules_from_spec(spec)

    from pyreshaper_spark.operators.checks import check_suite
    from pyreshaper_spark.session import get_spark

    spark = SparkSession.getActiveSession() or get_spark("dq-job")
    df = spark.read.parquet(args.table)
    verdicts = check_suite(df, rules)
    rows = verdicts.collect()
    if args.out:
        # verdict output is tiny (one row per rule) — rebuild from the
        # already-collected rows instead of re-running the whole suite
        # aggregation (a second full scan of the audited table)
        spark.createDataFrame(rows, verdicts.schema).write.mode(
            "append"
        ).parquet(args.out)
    report = {
        "op": "dq",
        "table": args.table,
        "n_rules": len(rows),
        "n_failed": sum(1 for r in rows if not r["passed"]),
        "rules": [
            {
                "rule": r["rule"],
                "violations": r["violations"],
                "n_rows": r["n_rows"],
                "passed": r["passed"],
            }
            for r in rows
        ],
    }
    print("DQ " + json.dumps(report))
    if args.strict and report["n_failed"]:
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
