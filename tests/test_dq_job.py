"""Config-driven DQ job (jobs/dq_job.py): JSON spec → single-scan
suite → verdict report + strict exit code + parquet audit history."""

from __future__ import annotations

import json
import os
import sys

import pytest

from tests.conftest import SF_SMOKE

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "jobs")
)

SPEC = [
    {"rule": "not_null", "column": "doc_id"},
    {"rule": "unique", "column": "doc_id"},
    {"rule": "bounds", "column": "doc_id", "lo": 0},
    {"rule": "length_min", "column": "text", "n": 1},
    {"rule": "matches", "column": "source", "pattern": "^src[0-9]+$"},
    {"rule": "in_set", "column": "lang",
     "values": ["de", "en", "es", "fr", "zh"]},
    {"rule": "sql", "name": "chars_consistent",
     "violation": "n_chars != length(text)"},
]


def _write_spec(tmp_path, spec):
    p = tmp_path / "rules.json"
    p.write_text(json.dumps(spec))
    return str(p)


def test_dq_job_clean_table_passes(spark, tmp_path, capsys):
    import dq_job

    rc = dq_job.main([
        "--table", f"{SF_SMOKE}/documents.parquet",
        "--rules", _write_spec(tmp_path, SPEC),
        "--strict",
        "--out", str(tmp_path / "audit"),
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.split("DQ ", 1)[1])
    assert report["n_rules"] == 7 and report["n_failed"] == 0
    assert all(r["passed"] for r in report["rules"])
    # audit rows landed (append mode builds history across runs)
    audit = spark.read.parquet(str(tmp_path / "audit"))
    assert audit.count() == 7


def test_dq_job_strict_fails_on_violation(spark, tmp_path, capsys):
    import dq_job

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    bad = spark.createDataFrame(
        [(990001, "x", "xx", "NOT_A_SOURCE", 99)], docs.schema
    )
    tbl = str(tmp_path / "docs")
    docs.unionByName(bad).write.parquet(tbl)
    rc = dq_job.main([
        "--table", tbl, "--rules", _write_spec(tmp_path, SPEC), "--strict",
    ])
    assert rc == 1
    report = json.loads(capsys.readouterr().out.split("DQ ", 1)[1])
    failed = {r["rule"] for r in report["rules"] if not r["passed"]}
    assert failed == {"source_matches", "lang_in_set", "chars_consistent"}
    # without --strict the same violations exit 0 (report-only mode)
    rc = dq_job.main([
        "--table", tbl, "--rules", _write_spec(tmp_path, SPEC),
    ])
    assert rc == 0


def test_dq_job_tolerance_and_bad_spec(spark, tmp_path, capsys):
    import dq_job

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    bad = spark.createDataFrame(
        [(990001, None, "en", "src1", 0)], docs.schema
    )
    tbl = str(tmp_path / "docs")
    docs.unionByName(bad).write.parquet(tbl)
    spec = [{"rule": "not_null", "column": "text", "tol": 1}]
    rc = dq_job.main([
        "--table", tbl, "--rules", _write_spec(tmp_path, spec), "--strict",
    ])
    assert rc == 0  # one violation tolerated
    report = json.loads(capsys.readouterr().out.split("DQ ", 1)[1])
    assert report["rules"][0]["violations"] == 1
    assert report["rules"][0]["passed"]

    with pytest.raises(ValueError, match="unknown rule kind"):
        dq_job.rules_from_spec([{"rule": "nope", "column": "x"}])
