"""Stateful streaming sessionization (applyInPandasWithState) vs the
batch sessionizer: with time-ordered arrival (three incremental
availableNow runs over time-split file batches), every session the
stream CLOSES must match the batch result; each user's final session
stays open in state."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyreshaper_spark.operators.events import sessionize
from pyreshaper_spark.streaming.sessions import streaming_sessionize
from tests.conftest import SF_SMOKE


def _run(spark, src, out, ck):
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_id long")
        .parquet(src)
    )
    q = (
        streaming_sessionize(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_streaming_sessions_match_batch(spark, tmp_path):
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .filter(F.col("user_id") < 10)
        .select("user_id", "ts", "event_id")
        .cache()
    )
    # split by time into three ordered slabs
    mids = ev.selectExpr("unix_timestamp(ts) ep").approxQuantile(
        "ep", [0.33, 0.66], 0.0
    )
    ep = F.unix_timestamp("ts")
    slabs = [
        ev.filter(ep < mids[0]),
        ev.filter((ep >= mids[0]) & (ep < mids[1])),
        ev.filter(ep >= mids[1]),
    ]
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    for slab in slabs:
        slab.write.mode("append").parquet(src)
        _run(spark, src, out, ck)

    got = {
        (r["user_id"], r["session_idx"]): (
            r["n_events"], r["first_ep"], r["last_ep"],
        )
        for r in spark.read.parquet(out).collect()
    }
    batch = sessionize(ev)
    last_idx = {
        r["user_id"]: r["m"]
        for r in batch.groupBy("user_id")
        .agg(F.max("session_idx").alias("m"))
        .collect()
    }
    want = {
        (r["user_id"], r["session_idx"]): (
            r["n_events"], r["first_ep"], r["last_ep"],
        )
        for r in batch.collect()
        if r["session_idx"] != last_idx[r["user_id"]]
    }
    assert got == want
    assert len(want) > 0
