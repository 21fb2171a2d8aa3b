"""Streaming hysteresis alerts (streaming/alert.py): batch parity with
operators.gapfill.alert_hysteresis on an in-order stream, plus direct
state-machine tests for multi-batch carry and late-row behavior."""

from __future__ import annotations

import pandas as pd
import pytest

from pyreshaper_spark.streaming.alert import alert_fn

W, HI, LO = 600, 70, 40


class _FakeState:
    def __init__(self):
        self._v, self.exists = None, False

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v, self.exists = v, True


def _run(batches, state=None):
    state = state or _FakeState()
    out = []
    for pdf in batches:
        got = list(alert_fn(W, HI, LO)(("s",), iter([pdf]), state))
        if got:
            out.extend(pd.concat(got).to_dict("records"))
    return out, state


def _pdf(rows):
    return pd.DataFrame(rows, columns=["source", "event_s", "n_tok"])


def test_alert_state_carries_across_batches():
    out, st = _run([
        _pdf([("s", 10, 80), ("s", 610, 50)]),   # closes b0 (80 -> fire)
        _pdf([("s", 1210, 30)]),                 # closes b600 (50 -> hold)
        _pdf([("s", 1810, 1)]),                  # closes b1200 (30 -> clear)
    ])
    assert [(r["bucket_s"], r["alert"], r["event"]) for r in out] == [
        (0, 1, "fire"),
        (600, 1, None),      # dead band holds across a batch boundary
        (1200, 0, "clear"),
    ]
    alert, ob, osum, late = st.get
    assert (alert, ob, osum, late) == (0, 1800, 1, 0)


def test_alert_state_machine_drops_late_rows():
    out, st = _run([
        _pdf([("s", 0, 80), ("s", 700, 10)]),   # closes b0 (fire)
        _pdf([("s", 90, 999)]),                 # late — must not re-fire
        _pdf([("s", 1300, 5)]),                 # closes b600 (10 -> clear)
    ])
    assert [(r["bucket_s"], r["event"]) for r in out] == [
        (0, "fire"), (600, "clear"),
    ]
    assert out[1]["value"] == 10  # late row never contaminated the sum
    assert st.get[3] == 1


def test_alert_fn_rejects_inverted_band():
    with pytest.raises(ValueError):
        alert_fn(W, hi=10, lo=20)


def test_streaming_alert_parity_with_batch(spark, seq):
    """availableNow over a sorted static input ≡ batch hysteresis minus
    each source's final (still-open) bucket."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from pyreshaper_spark.operators.gapfill import alert_hysteresis
    from pyreshaper_spark.operators.rollup import rollup_tier0
    from pyreshaper_spark.streaming.alert import streaming_alert

    base = tempfile.mkdtemp(prefix="t_stream_al_")
    src = os.path.join(base, "src")
    (
        seq.select("source", "event_s", "n_tok")
        .orderBy("event_s")
        .coalesce(1)
        .write.parquet(src)
    )
    rows: list = []

    def sink(batch_df, _epoch):
        rows.extend(batch_df.collect())

    stream = spark.readStream.schema(
        "source string, event_s long, n_tok long"
    ).parquet(src)
    sq = (
        streaming_alert(stream, W, hi=HI, lo=LO)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(base, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination(300)
    got = {
        (r["source"], r["bucket_s"], r["value"], r["alert"], r["event"])
        for r in rows
    }
    assert all(r["late_rows"] == 0 for r in rows)

    tier = rollup_tier0(seq, W)
    batch = alert_hysteresis(tier, hi=HI, lo=LO)
    hw = tier.groupBy("source").agg(F.max("bucket_s").alias("mb"))
    want = {
        (r["source"], r["bucket_s"], r["value"], r["alert"], r["event"])
        for r in batch.join(hw, "source")
        .filter(F.col("bucket_s") < F.col("mb"))
        .collect()
    }
    assert got == want and got
