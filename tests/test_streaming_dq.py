"""Streaming DQ monitor: multi-batch accumulation ≡ batch suite."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def test_streaming_dq_multibatch_equals_batch(spark, tmp_path):
    from pyreshaper_spark.operators.checks import (
        check_suite,
        documents_rules,
    )
    from pyreshaper_spark.streaming.dq import (
        dq_verdicts,
        streaming_dq,
        streaming_rules,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    # inject one violation so the counters are not trivially zero
    bad = spark.createDataFrame(
        [(990001, "x", "xx", "NOT_A_SOURCE", 1)], docs.schema
    )
    docs = docs.unionByName(bad)
    src = str(tmp_path / "src")
    # several files + maxFilesPerTrigger=1 → genuinely multi-batch
    docs.repartition(4).write.parquet(src)
    rules = streaming_rules(documents_rules())

    last: dict[str, list] = {}
    n_batches = {"n": 0}

    def capture(batch_df, _epoch):
        rows = batch_df.collect()
        n_batches["n"] += 1
        if rows:
            last["row"] = rows

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sq = (
        streaming_dq(stream, rules)
        .writeStream.outputMode("complete")
        .foreachBatch(capture)
        .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination(300)
    assert n_batches["n"] >= 2  # the counters really accumulated

    got = {
        r["rule"]: (r["violations"], r["n_rows"], r["passed"])
        for r in dq_verdicts(
            spark.createDataFrame(last["row"]), rules
        ).collect()
    }
    want = {
        r["rule"]: (r["violations"], r["n_rows"], r["passed"])
        for r in check_suite(docs, rules).collect()
    }
    assert got == want
    assert got["source_matches"][0] == 1 and not got["source_matches"][2]
    assert got["lang_in_set"][0] == 1


def test_streaming_dq_rejects_unique_rules(spark, tmp_path):
    from pyreshaper_spark.operators.checks import documents_rules, unique
    from pyreshaper_spark.streaming.dq import (
        streaming_dq,
        streaming_rules,
    )

    src = str(tmp_path / "src")
    spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(1).write.parquet(
        src
    )
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(src)
    with pytest.raises(ValueError, match="doc_id_unique"):
        streaming_dq(stream, documents_rules())
    # and the subset helper strips exactly the distinct rules
    rules = streaming_rules(documents_rules())
    assert all(r.distinct_col is None for r in rules)
    assert len(documents_rules()) - len(rules) == 1
    with pytest.raises(ValueError, match="unbounded"):
        streaming_dq(stream, [unique("doc_id")])


def test_streaming_dq_resumes_from_checkpoint(spark, tmp_path):
    """Two availableNow runs over ONE checkpoint: the second run picks
    up only the files added since, and the counters keep accumulating
    from recovered state (exactly-once across restarts)."""
    import glob
    import shutil

    from pyreshaper_spark.operators.checks import (
        check_suite,
        documents_rules,
    )
    from pyreshaper_spark.streaming.dq import (
        dq_verdicts,
        streaming_dq,
        streaming_rules,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "src")
    stage = str(tmp_path / "stage")
    half_a.coalesce(1).write.parquet(src)
    half_b.coalesce(1).write.parquet(stage)
    ck = os.path.join(str(tmp_path), "ck")
    rules = streaming_rules(documents_rules())
    last: dict[str, list] = {}

    def capture(batch_df, _epoch):
        rows = batch_df.collect()
        if rows:
            last["row"] = rows

    def run_once():
        stream = spark.readStream.schema(DOCS_SCHEMA).parquet(src)
        sq = (
            streaming_dq(stream, rules)
            .writeStream.outputMode("complete")
            .foreachBatch(capture)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        sq.awaitTermination(300)

    run_once()
    n_a = {r["rule"]: r["n_rows"] for r in dq_verdicts(
        spark.createDataFrame(last["row"]), rules
    ).collect()}
    assert set(n_a.values()) == {half_a.count()}

    # drop in the second half and RESTART from the same checkpoint
    for f in glob.glob(os.path.join(stage, "part-*")):
        shutil.copy(f, os.path.join(src, os.path.basename(f)))
    run_once()
    got = {
        r["rule"]: (r["violations"], r["n_rows"])
        for r in dq_verdicts(
            spark.createDataFrame(last["row"]), rules
        ).collect()
    }
    want = {
        r["rule"]: (r["violations"], r["n_rows"])
        for r in check_suite(docs, rules).collect()
    }
    assert got == want
    assert set(v[1] for v in got.values()) == {docs.count()}


def test_streaming_dq_by_source_multibatch(spark, tmp_path):
    """Keyed monitor: multi-batch run lands on the batch keyed suite,
    violations attributed to the right feed; unique rules rejected."""
    from pyreshaper_spark.operators.checks import (
        check_suite_by,
        documents_rules,
    )
    from pyreshaper_spark.streaming.dq import (
        dq_verdicts,
        streaming_dq_by,
        streaming_rules,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    bad = spark.createDataFrame(
        [(990001, None, "en", "src5", 0)], docs.schema
    )
    docs = docs.unionByName(bad)
    src = str(tmp_path / "src")
    docs.repartition(3).write.parquet(src)
    rules = streaming_rules(documents_rules())
    table: dict[str, tuple] = {}

    def upsert(batch_df, _epoch):
        for r in batch_df.collect():
            table[r["source"]] = tuple(r)

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sq = (
        streaming_dq_by(stream, rules)
        .writeStream.outputMode("update")
        .foreachBatch(upsert)
        .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination(300)
    cols = ["source", "_n"] + [f"_v{i}" for i in range(len(rules))]
    wide = spark.createDataFrame(
        [table[s] for s in sorted(table)],
        ", ".join(f"{c} {'string' if c == 'source' else 'long'}"
                  for c in cols),
    )
    got = {
        (r["source"], r["rule"]): (r["violations"], r["n_rows"])
        for r in dq_verdicts(wide, rules, keys=("source",)).collect()
    }
    want = {
        (r["source"], r["rule"]): (r["violations"], r["n_rows"])
        for r in check_suite_by(docs, rules).collect()
    }
    assert got == want
    assert got[("src5", "text_not_null")][0] == 1

    from pyreshaper_spark.operators.checks import unique

    with pytest.raises(ValueError, match="unbounded"):
        streaming_dq_by(stream, [unique("doc_id")])
