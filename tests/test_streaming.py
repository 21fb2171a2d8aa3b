"""Structured Streaming tier-0 ingest: backlog processing, exactness vs
the batch rollup, and incremental pickup of new files."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyreshaper_spark.fixtures import sequences_df
from pyreshaper_spark.operators.rollup import rollup_tier0
from pyreshaper_spark.sources.iceberglite import IcebergLite
from pyreshaper_spark.streaming.ingest import start_tier0_stream
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def seq(spark):
    return sequences_df(spark, SF_SMOKE).cache()


def _run_stream(spark, seq_path, out, ck):
    q = start_tier0_stream(spark, seq_path, out, ck, width_s=60)
    q.awaitTermination(120)
    return IcebergLite(out)


def test_streaming_tier0_matches_batch(spark, seq, tmp_path):
    seq_path = str(tmp_path / "seq")
    seq.write.parquet(seq_path)
    cat = _run_stream(
        spark, seq_path, str(tmp_path / "out"), str(tmp_path / "ck")
    )
    got = (
        cat.read(spark, "tier_stream")
        .select("source", "bucket_s", "cnt", "sum_n_tok")
        .collect()
    )
    want = rollup_tier0(seq, 60).select(
        "source", "bucket_s", "cnt", "sum_n_tok"
    ).collect()
    assert sorted(got) == sorted(want)


def test_streaming_incremental_pickup(spark, seq, tmp_path):
    """New files with NEWER event times are picked up incrementally;
    splitting by time (not source) respects the checkpointed watermark —
    data older than the watermark would be dropped as late, by design."""
    seq_path = str(tmp_path / "seq")
    mid = seq.approxQuantile("event_s", [0.5], 0.0)[0]
    first = seq.filter(F.col("event_s") < mid)
    rest = seq.filter(F.col("event_s") >= mid)
    first.write.parquet(seq_path)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    cat = _run_stream(spark, seq_path, out, ck)
    n1 = cat.read(spark, "tier_stream").agg(F.sum("cnt")).collect()[0][0]
    assert n1 == first.count()

    # append late files; a second availableNow run picks up ONLY them
    rest.write.mode("append").parquet(seq_path)
    cat = _run_stream(spark, seq_path, out, ck)
    n2 = cat.read(spark, "tier_stream").agg(F.sum("cnt")).collect()[0][0]
    assert n2 == seq.count()

    # exactness after the incremental merge
    want = rollup_tier0(seq, 60).select("source", "bucket_s", "cnt").collect()
    got = cat.read(spark, "tier_stream").select(
        "source", "bucket_s", "cnt"
    ).collect()
    assert sorted(got) == sorted(want)


def test_refresh_cascade_from_stream_tier(spark, seq, tmp_path):
    """Coarser tiers refreshed from the streaming tier-0 table match a
    batch cascade over the same input exactly."""
    from pyreshaper_spark.operators.rollup import rollup_all_tiers
    from pyreshaper_spark.streaming.ingest import refresh_cascade

    seq_path = str(tmp_path / "seq")
    seq.write.parquet(seq_path)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    cat = _run_stream(spark, seq_path, out, ck)

    sids = refresh_cascade(spark, out, [600, 3600])
    assert set(sids) == {600, 3600}
    batch = rollup_all_tiers(seq, [60, 600, 3600])
    for w in (600, 3600):
        want = sorted(
            batch[w].select("source", "bucket_s", "cnt", "sum_n_tok").collect()
        )
        got = sorted(
            cat.read(spark, f"tier_stream_{w}")
            .select("source", "bucket_s", "cnt", "sum_n_tok")
            .collect()
        )
        assert got == want


# -- exactly-once raw append sink (streaming/sink.py) ------------------------


def test_append_once_commit_dedup(spark, tmp_path):
    """A replayed commit key no-ops before writing any data."""
    cat = IcebergLite(str(tmp_path / "wh"))
    df = spark.createDataFrame([("d1", 1)], "doc_id string, v long")
    s1 = cat.append_once("t", df, key="sink:0")
    s2 = cat.append_once("t", df, key="sink:0")  # replay
    assert s1 == s2
    assert cat.read(spark, "t").count() == 1
    s3 = cat.append_once("t", df, key="sink:1")  # a NEW epoch appends
    assert s3 > s1
    assert cat.read(spark, "t").count() == 2


def test_append_once_empty_epoch_commits_nothing(spark, tmp_path):
    """An empty micro-batch must not grow the snapshot log (no empty
    snapshot, no commit key) — detected from the written file list, so
    the foreachBatch sink needs no per-batch isEmpty() pre-scan."""
    cat = IcebergLite(str(tmp_path / "wh"))
    df = spark.createDataFrame([("d1", 1)], "doc_id string, v long")
    s1 = cat.append_once("t", df, key="sink:0")
    empty = df.filter("v < 0")
    s2 = cat.append_once("t", empty, key="sink:1")
    assert s2 == s1  # head unchanged — no new snapshot
    log_snaps = [
        s["id"] for s in cat._read_log("t")["snapshots"]
    ]
    assert log_snaps == [s1]
    # the skipped epoch's key is NOT burned: a later non-empty retry
    # of the same epoch id still lands
    s3 = cat.append_once("t", df, key="sink:1")
    assert s3 > s1
    assert cat.read(spark, "t").count() == 2


def test_raw_append_stream_exactly_once(spark, seq, tmp_path):
    """The raw sink lands exactly the input rows; replaying an epoch's
    foreachBatch call (task/driver retry) adds nothing."""
    from pyreshaper_spark.streaming.sink import (
        make_append_sink,
        start_raw_append_stream,
    )

    seq_path = str(tmp_path / "seq")
    seq.write.parquet(seq_path)
    out = str(tmp_path / "out")
    q = start_raw_append_stream(
        spark, seq_path, out, str(tmp_path / "ck"), sink_id="s1"
    )
    q.awaitTermination(120)
    cat = IcebergLite(out)
    landed = cat.read(spark, "sequences_raw")
    assert landed.count() == seq.count()
    # token arrays survive byte-exact (the port-fidelity invariant)
    j = seq.alias("a").join(landed.alias("b"), "doc_id")
    bad = j.filter(F.col("a.tokens") != F.col("b.tokens")).count()
    assert bad == 0
    # simulate an epoch replay: re-invoke the sink fn with an epoch id
    # the checkpoint already committed
    n_snaps = len(cat.snapshots("sequences_raw"))
    sink = make_append_sink(out, "sequences_raw", "s1")
    batch = spark.read.parquet(seq_path)
    sink(batch, 0)  # epoch 0 was already committed by the stream
    assert len(cat.snapshots("sequences_raw")) == n_snaps
    assert cat.read(spark, "sequences_raw").count() == seq.count()
    # downstream CDC sees the landed rows exactly once
    ch = cat.read_changes(spark, "sequences_raw", from_snapshot_id=0)
    assert ch.filter(F.col("_change_type") == "insert").count() == seq.count()


def test_empty_backlog_leaves_typed_empty_tables(spark, seq, tmp_path):
    """Create-before-stream contract: draining an EMPTY backlog must
    still leave a typed zero-row table behind each streaming sink
    (tier0, raw append, dedup), so downstream readers see schema, not
    SnapshotNotFound. create_table is idempotent — a later non-empty
    run lands data in the same table."""
    from pyreshaper_spark.streaming.dedup import (
        DEDUP_TABLE,
        start_dedup_stream,
    )
    from pyreshaper_spark.streaming.sink import start_raw_append_stream

    seq_path = str(tmp_path / "seq")
    seq.limit(0).write.parquet(seq_path)
    out = str(tmp_path / "out")

    for i, starter in enumerate(
        (start_tier0_stream, start_raw_append_stream, start_dedup_stream)
    ):
        q = starter(spark, seq_path, out, str(tmp_path / f"ck{i}"))
        q.awaitTermination(120)
    cat = IcebergLite(out)
    for table, cols in (
        ("tier_stream", {"source", "bucket_s", "cnt", "epoch"}),
        ("sequences_raw", {"doc_id", "tokens", "n_tok"}),
        (DEDUP_TABLE, {"content_key", "doc_id"}),
    ):
        df = cat.read(spark, table, allow_empty=True)
        assert df.count() == 0
        assert cols <= set(df.columns)

    # the cascade refresh over the empty tier-0 also yields typed
    # empty tiers instead of raising
    from pyreshaper_spark.streaming.ingest import refresh_cascade

    refresh_cascade(spark, out, [600])
    t = cat.read(spark, "tier_stream_600", allow_empty=True)
    assert t.count() == 0 and "bucket_s" in t.columns

    # idempotent create: a second, NON-empty run into the same tables
    seq_path2 = str(tmp_path / "seq2")
    seq.write.parquet(seq_path2)
    q = start_tier0_stream(
        spark, seq_path2, out, str(tmp_path / "ck_full")
    )
    q.awaitTermination(120)
    n = cat.read(spark, "tier_stream").agg(F.sum("cnt")).collect()[0][0]
    assert n == seq.count()
