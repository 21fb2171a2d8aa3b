"""Streaming exact dedup: key-set parity with batch distinct, global
uniqueness across incremental runs, idempotent replay semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyreshaper_spark.fixtures import sequences_df
from pyreshaper_spark.sources.iceberglite import IcebergLite
from pyreshaper_spark.streaming.dedup import (
    DEDUP_TABLE,
    content_key,
    start_dedup_stream,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def seq(spark):
    return sequences_df(spark, SF_SMOKE).cache()


def _dupped(seq):
    """Fixture plus injected exact-duplicate payloads (fresh doc_ids,
    same tokens -> same content key)."""
    dupes = (
        seq.limit(10)
        .withColumn("doc_id", F.concat(F.lit("dup_"), F.col("doc_id")))
        .withColumn("event_s", F.col("event_s") + 30)
    )
    return seq.unionByName(dupes)


def _run(spark, seq_path, out, ck):
    q = start_dedup_stream(spark, seq_path, out, ck)
    q.awaitTermination(120)
    return IcebergLite(out)


def test_streaming_dedup_key_set_matches_batch(spark, seq, tmp_path):
    data = _dupped(seq)
    seq_path = str(tmp_path / "seq")
    data.write.parquet(seq_path)
    cat = _run(spark, seq_path, str(tmp_path / "out"), str(tmp_path / "ck"))
    out = cat.read(spark, DEDUP_TABLE)
    got = {r["content_key"] for r in out.select("content_key").collect()}
    want = {
        r["k"]
        for r in data.select(content_key().alias("k")).distinct().collect()
    }
    assert got == want
    # exactly one row per key survived
    assert out.count() == len(want)


def test_streaming_dedup_incremental_and_cross_batch(spark, seq, tmp_path):
    """A second availableNow run over newly arrived files appends only
    never-seen keys — duplicates of keys committed in run 1 are dropped
    by the sink anti-join even though the stream state is gone."""
    seq_path = str(tmp_path / "seq")
    # deterministic split (a bare limit() re-evaluates differently per
    # job, which would leak run-1 payloads into the "new" set)
    half = seq.orderBy("doc_id").limit(25).cache()
    half.write.parquet(seq_path)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    cat = _run(spark, seq_path, out, ck)
    n1 = cat.read(spark, DEDUP_TABLE).count()

    # run-2 arrivals must sit past run 1's checkpointed GLOBAL watermark
    # (max event time − delay) or they are dropped as late, by design;
    # content keys are token-only, so shifting event_s keeps semantics
    hi = seq.agg(F.max("event_s")).collect()[0][0] + 3600
    # re-sends of run-1 payloads (new doc_ids, same tokens)
    resend = (
        half.limit(5)
        .withColumn("doc_id", F.concat(F.lit("re_"), F.col("doc_id")))
        .withColumn("event_s", F.lit(hi))
    )
    new = (
        seq.join(half.select("doc_id"), "doc_id", "left_anti")
        .orderBy("doc_id")
        .limit(7)
        .withColumn("event_s", F.lit(hi))
    )
    resend.unionByName(new).write.mode("append").parquet(seq_path)
    cat = _run(spark, seq_path, out, ck)
    got = cat.read(spark, DEDUP_TABLE)
    assert got.count() == n1 + 7  # resends dropped, new keys appended
    # still globally unique
    assert got.select("content_key").distinct().count() == got.count()
    # run-1 survivors untouched (first-seen wins across runs)
    assert got.filter(F.col("doc_id").startswith("re_")).count() == 0
