"""Streaming quota-crossing alerts (streaming/quota.py): batch parity
with operators.rollup.quota_cross on an in-order stream, plus direct
state-machine tests for exactly-once emission, multi-batch splits, and
late rows."""

from __future__ import annotations

import pandas as pd

from pyreshaper_spark.streaming.quota import quota_fn

W, Q = 600, 100


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
        got = list(quota_fn(W, Q)(("s",), iter([pdf]), state))
        if got:
            out.extend(pd.concat(got).to_dict("records"))
    return out, state


def _pdf(rows):
    return pd.DataFrame(rows, columns=["source", "event_s", "n_tok"])


def test_crossing_emitted_once_on_bucket_close():
    out, st = _run([
        _pdf([("s", 10, 60), ("s", 20, 30)]),       # b0 open, sum 90
        _pdf([("s", 610, 50)]),                      # closes b0: cum 90 < Q
        _pdf([("s", 1210, 5)]),                      # closes b600: cum 140 ≥ Q
        _pdf([("s", 1810, 999)]),                    # closes b1200: no re-emit
    ])
    assert out == [
        {"source": "s", "cross_bucket_s": 600, "cum_at_cross": 140}
    ]
    cum, crossed, ob, osum, late = st.get
    assert (crossed, ob, osum, late) == (True, 1800, 999, 0)
    assert cum == 145  # b1200's 5 folded in after the crossing


def test_crossing_in_final_open_bucket_waits_for_close():
    # cum reaches Q inside the still-open bucket → nothing emitted yet
    out, st = _run([_pdf([("s", 10, 150)])])
    assert out == []
    # the close (arrival of a later bucket) fires the alert with the
    # FULL bucket sum, including a second same-bucket chunk
    out2, _ = _run([_pdf([("s", 50, 7)]), _pdf([("s", 700, 1)])], state=st)
    assert out2 == [
        {"source": "s", "cross_bucket_s": 0, "cum_at_cross": 157}
    ]


def test_late_rows_counted_not_crossed():
    out, st = _run([
        _pdf([("s", 700, 10)]),                      # b600 open
        _pdf([("s", 100, 999)]),                     # late: b0 < open b600
        _pdf([("s", 1300, 95)]),                     # closes b600: cum 10 < Q
    ])
    assert out == []
    cum, crossed, ob, osum, late = st.get
    assert (cum, crossed, ob, osum, late) == (10, False, 1200, 95, 1)


def test_batch_parity_on_in_order_stream(spark, seq):
    """availableNow over one sorted file ≡ batch quota_cross minus
    crossings in each source's final (still-open) bucket."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from pyreshaper_spark.operators.rollup import (
        quota_cross,
        rollup_all_tiers,
    )
    from pyreshaper_spark.streaming.quota import streaming_quota

    base = tempfile.mkdtemp(prefix="stream_qt_t_")
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
        streaming_quota(stream, 600, 700)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(base, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination(300)
    got = {(r["source"], r["cross_bucket_s"], r["cum_at_cross"])
           for r in rows}

    tier = rollup_all_tiers(seq, (600,))[600]
    last = tier.groupBy("source").agg(F.max("bucket_s").alias("mb"))
    want_df = (
        quota_cross(tier, 700)
        .join(last, "source")
        .filter(F.col("cross_bucket_s") < F.col("mb"))
    )
    want = {(r["source"], r["cross_bucket_s"], r["cum_at_cross"])
            for r in want_df.collect()}
    assert got == want and len(got) > 0
