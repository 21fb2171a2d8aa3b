"""End-to-end curation pipeline (jobs/curate_job.py): stage
conservation, leakage safety, redaction, determinism, CLI round-trip."""

from __future__ import annotations

import json
import os
import sys

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "jobs")
)


def _docs(spark):
    base = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    # inject an exact duplicate and a PII-bearing doc so every stage
    # demonstrably fires on the fixture
    src = base.limit(1).collect()[0]
    extra = spark.createDataFrame(
        [
            (900001, src["text"], src["lang"], src["source"],
             src["n_chars"]),
            (900002,
             "the quick brown fox wrote to alice.smith@example.org "
             "about invoice 123456789 from 10.1.2.3 yesterday morning "
             "regarding the quarterly shipment of spark parts",
             "en", src["source"], 150),
            (900003, None, "en", src["source"], 0),  # invalid input
        ],
        base.schema,
    )
    return base.unionByName(extra)


def test_curate_conservation_and_leakage(spark):
    import curate_job

    docs = _docs(spark)
    out, m = curate_job.curate(docs, max_df=200)
    # stage conservation: input = out + all drops
    assert m["n_input"] == (
        m["n_out"] + m["n_null_text"] + m["n_exact_dropped"]
        + m["n_near_dropped"] + m["n_quality_dropped"]
        + m["n_quota_dropped"]
    )
    assert m["n_null_text"] == 1          # the injected NULL-text row
    assert m["n_quota_dropped"] == 0      # no quotas on this run
    assert m["n_exact_dropped"] >= 1      # the injected exact dupe
    assert m["n_out"] == m["n_train"] + m["n_val"] + m["n_test"]
    assert m["n_docs_redacted"] >= 1      # the injected PII doc
    rows = out.collect()
    assert len(rows) == m["n_out"]
    # no remaining PII in shipped text
    assert not any("example.org" in r["red_text"] for r in rows)
    assert any("<EMAIL>" in r["red_text"] for r in rows)

    # leakage safety: recompute the pair graph on the shipped corpus —
    # near-dup semantics guarantee no surviving pair at all (one
    # survivor per component), which implies no cross-split pair
    from pyreshaper_spark.operators.dedup import verified_near_dups

    shipped = docs.join(out.select("doc_id"), "doc_id")
    assert verified_near_dups(shipped, max_df=200).count() == 0


def test_curate_quota_and_determinism(spark):
    import curate_job

    docs = _docs(spark)
    out1, m1 = curate_job.curate(docs, quotas={"src0": 5, "src1": 3})
    # the conservation identity must hold ON A QUOTA RUN too
    assert m1["n_input"] == (
        m1["n_out"] + m1["n_null_text"] + m1["n_exact_dropped"]
        + m1["n_near_dropped"] + m1["n_quality_dropped"]
        + m1["n_quota_dropped"]
    )
    assert m1["n_quota_dropped"] > 0
    assert m1["n_out"] <= 8
    per_src = {
        r["source"]: r["n"]
        for r in out1.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert per_src.get("src0", 0) <= 5 and per_src.get("src1", 0) <= 3
    assert set(per_src) <= {"src0", "src1"}
    # deterministic rerun: identical row set
    out2, m2 = curate_job.curate(docs, quotas={"src0": 5, "src1": 3})
    assert m1 == m2
    assert sorted(map(tuple, out1.collect())) == sorted(
        map(tuple, out2.collect())
    )


def test_curate_cli_round_trip(spark, tmp_path, capsys):
    import curate_job

    outp = str(tmp_path / "curated")
    rc = curate_job.main(
        ["--docs", f"{SF_SMOKE}/documents.parquet", "--out", outp,
         "--quota", "src0=4"]
    )
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    m = json.loads(line)
    assert m["n_input"] == 500
    back = spark.read.parquet(outp)
    assert back.count() == m["n_out"]
    assert set(back.columns) == {
        "doc_id", "source", "split", "red_text", "n_redacted"
    }


def test_curate_cli_iceberglite_releases(spark, tmp_path, capsys):
    """--table commits one atomic snapshot per curation run: the
    current read equals the latest release, and the previous release
    stays time-travelable with split-partition pruning intact."""
    import curate_job
    from pyreshaper_spark.sources.iceberglite import IcebergLite

    root = str(tmp_path / "warehouse")
    spec = f"{root}::curated"
    rc = curate_job.main(
        ["--docs", f"{SF_SMOKE}/documents.parquet", "--table", spec]
    )
    assert rc == 0
    m1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    rc = curate_job.main(
        ["--docs", f"{SF_SMOKE}/documents.parquet", "--table", spec,
         "--quota", "src0=4"]
    )
    assert rc == 0
    m2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m2["snapshot_id"] > m1["snapshot_id"]

    cat = IcebergLite(root)
    live = cat.read(spark, "curated")
    assert live.count() == m2["n_out"]
    past = cat.read(spark, "curated", snapshot_id=m1["snapshot_id"])
    assert past.count() == m1["n_out"]
    # split is a hive partition: a partition_filter prunes to one split
    val_only = cat.read(
        spark, "curated",
        partition_filter=lambda p: p.get("split") == "val",
    )
    assert val_only.count() == m2["n_val"]


def test_curate_dq_gate(spark):
    import curate_job
    import pytest
    from pyreshaper_spark.operators.checks import documents_rules

    docs = _docs(spark)  # carries one NULL-text row -> text_not_null fails
    out, m = curate_job.curate(docs, dq_rules=documents_rules())
    by_rule = {d["rule"]: d for d in m["dq"]}
    assert len(by_rule) == 9
    assert by_rule["text_not_null"]["violations"] == 1
    assert not by_rule["text_not_null"]["passed"]
    assert by_rule["doc_id_unique"]["passed"]
    # the injected doc with a wrong n_chars trips the consistency rule
    assert by_rule["n_chars_consistent"]["violations"] == 1
    # strict mode refuses the release on the same input
    with pytest.raises(ValueError, match="text_not_null"):
        curate_job.curate(docs, dq_rules=documents_rules(), dq_strict=True)
    # the shipped corpus (no injections) passes strict end-to-end
    clean = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out2, m2 = curate_job.curate(
        clean, dq_rules=documents_rules(), dq_strict=True
    )
    assert all(d["passed"] for d in m2["dq"])
    assert m2["n_out"] > 0
