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
