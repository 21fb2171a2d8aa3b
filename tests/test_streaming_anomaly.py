"""Streaming anomaly z-flags (streaming/anomaly.py): direct
state-machine tests plus availableNow batch parity vs
operators.gapfill.anomaly_zflag's closed-bucket restriction."""

from __future__ import annotations

import pandas as pd

from pyreshaper_spark.streaming.anomaly import anomaly_fn

W = 600


class _FakeState:
    def __init__(self):
        self._v, self.exists = None, False

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v, self.exists = v, True


def _run(batches, state=None, **kw):
    state = state or _FakeState()
    out = []
    for pdf in batches:
        got = list(anomaly_fn(W, **kw)(("s",), iter([pdf]), state))
        if got:
            out.extend(pd.concat(got).to_dict("records"))
    return out, state


def _pdf(rows):
    return pd.DataFrame(rows, columns=["source", "event_s", "n_tok"])


def test_spike_flagged_after_min_n_closed_buckets():
    # four steady buckets then a spike; each close emits one row
    rows = [("s", i * W + 10, 100) for i in range(4)]
    rows.append(("s", 4 * W + 10, 10_000))          # the spike
    rows.append(("s", 5 * W + 10, 100))             # closes the spike
    out, st = _run([_pdf(rows)])
    assert [r["bucket_s"] for r in out] == [0, 600, 1200, 1800, 2400]
    assert [r["roll_n"] for r in out] == [0, 1, 2, 3, 4]
    # steady buckets: zero variance AND zero deviation -> not flagged
    assert [r["is_anomaly"] for r in out] == [
        False, False, False, False, True
    ]
    sums, ob, osum, late = st.get
    assert (ob, osum, late) == (3000, 100, 0)
    assert list(sums) == [100, 100, 100, 100, 10_000]


def test_window_truncates_to_k():
    rows = [("s", i * W, 100 + i) for i in range(10)]
    out, st = _run([_pdf(rows)], k=3)
    assert [r["roll_n"] for r in out] == [0, 1, 2, 3, 3, 3, 3, 3, 3]
    sums, *_ = st.get
    assert list(sums) == [106, 107, 108]


def test_min_n_suppresses_early_flags():
    rows = [("s", 0, 1), ("s", W, 10_000), ("s", 2 * W, 1)]
    out, _ = _run([_pdf(rows)], min_n=3)
    # the 10k bucket closes with only 1 trailing point -> never flagged
    assert all(not r["is_anomaly"] for r in out)


def test_batch_parity_on_in_order_stream(spark, seq):
    import os
    import tempfile

    from pyspark.sql import functions as F

    from pyreshaper_spark.operators.gapfill import anomaly_zflag
    from pyreshaper_spark.operators.rollup import rollup_all_tiers
    from pyreshaper_spark.streaming.anomaly import streaming_anomaly

    base = tempfile.mkdtemp(prefix="stream_an_t_")
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
        streaming_anomaly(stream, 600)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(base, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination(300)
    got = {
        (r["source"], r["bucket_s"], r["sum_n_tok"], r["roll_n"],
         r["is_anomaly"])
        for r in rows
    }

    tier = rollup_all_tiers(seq, (600,))[600]
    last = tier.groupBy("source").agg(F.max("bucket_s").alias("mb"))
    want_df = (
        anomaly_zflag(tier)
        .join(last, "source")
        .filter(F.col("bucket_s") < F.col("mb"))
    )
    want = {
        (r["source"], r["bucket_s"], r["sum_n_tok"], r["roll_n"],
         r["is_anomaly"])
        for r in want_df.collect()
    }
    assert got == want and len(got) > 0
    # flag firing is covered by the state-machine tests above; this
    # fixture may legitimately contain no anomalies, and the set
    # equality already compares every is_anomaly value
