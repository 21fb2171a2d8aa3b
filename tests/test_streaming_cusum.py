"""Streaming fixed-target CUSUM (streaming/cusum.py): state-machine
tests of the recursion/close/late paths plus availableNow batch parity
vs operators.gapfill.cusum_fixed's closed-bucket restriction, and a
batch test that the fixed-target operator matches the textbook
recursion."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Row

from pyreshaper_spark.streaming.cusum import cusum_fn

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
        got = list(cusum_fn(W, **kw)(("s",), iter([pdf]), state))
        if got:
            out.extend(pd.concat(got).to_dict("records"))
    return out, state


def _pdf(rows):
    return pd.DataFrame(rows, columns=["source", "event_s", "n_tok"])


def test_recursion_matches_textbook():
    # mu = 100: values 100, 150, 30, 200 -> S = 0, 50, 0, 100
    rows = [
        ("s", 0, 100), ("s", W, 150), ("s", 2 * W, 30), ("s", 3 * W, 200),
        ("s", 4 * W, 1),  # closes bucket 3
    ]
    out, st = _run([_pdf(rows)], mu=100, h=60)
    assert [r["bucket_s"] for r in out] == [0, 600, 1200, 1800]
    assert [r["cusum"] for r in out] == [0, 50, 0, 100]
    assert [r["flag"] for r in out] == [False, False, False, True]
    s_cur, ob, osum, late = st.get
    assert (s_cur, ob, osum, late) == (100, 4 * W, 1, 0)


def test_state_survives_batch_boundary():
    out1, st = _run([_pdf([("s", 0, 160)])], mu=100, h=1000)
    assert out1 == []  # bucket 0 still open
    out2, st = _run(
        [_pdf([("s", W, 160), ("s", 2 * W, 160)])], state=st,
        mu=100, h=1000,
    )
    # closes buckets 0 and 600: S = 60 then 120
    assert [(r["bucket_s"], r["cusum"]) for r in out2] == [
        (0, 60), (600, 120)
    ]


def test_same_bucket_accumulates_and_late_rows_drop():
    rows = [("s", 0, 50), ("s", 10, 60), ("s", W, 1)]
    out, st = _run([_pdf(rows)], mu=100, h=5)
    assert [(r["bucket_s"], r["sum_n_tok"], r["cusum"]) for r in out] == [
        (0, 110, 10)
    ]
    assert out[0]["flag"]
    # a row for the already-closed bucket 0 counts late, changes nothing
    out2, st = _run([_pdf([("s", 5, 999)])], state=st, mu=100, h=5)
    assert out2 == []
    s_cur, ob, osum, late = st.get
    assert (s_cur, ob, osum, late) == (10, W, 1, 1)


def test_batch_parity_on_in_order_stream(spark, seq):
    import os
    import tempfile

    from pyspark.sql import functions as F

    from pyreshaper_spark.operators.gapfill import cusum_fixed
    from pyreshaper_spark.operators.rollup import rollup_all_tiers
    from pyreshaper_spark.streaming.cusum import streaming_cusum

    base = tempfile.mkdtemp(prefix="stream_cu_t_")
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
        streaming_cusum(stream, 600, mu=55, h=120)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(base, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination(300)
    got = {
        (r["source"], r["bucket_s"], r["sum_n_tok"], r["cusum"], r["flag"])
        for r in rows
    }

    tier = rollup_all_tiers(seq, (600,))[600]
    last = tier.groupBy("source").agg(F.max("bucket_s").alias("mb"))
    want_df = (
        cusum_fixed(tier, mu=55, h=120)
        .join(last, "source")
        .filter(F.col("bucket_s") < F.col("mb"))
    )
    want = {
        (r["source"], r["bucket_s"], r["value"], r["cusum"], r["flag"])
        for r in want_df.collect()
    }
    assert got == want and len(got) > 0
    assert any(f for *_, f in got) or all(not f for *_, f in got)


def test_cusum_fixed_batch_matches_recursion(spark):
    from pyreshaper_spark.operators.gapfill import cusum_fixed

    vals = [100, 150, 30, 200, 90, 300, 10, 10, 10, 500]
    tier = spark.createDataFrame(
        [Row(source="a", bucket_s=i * W, sum_n_tok=v)
         for i, v in enumerate(vals)]
    )
    out = {
        r.bucket_s: (r.cusum, r.flag)
        for r in cusum_fixed(tier, mu=100, h=150).collect()
    }
    s = 0
    for i, v in enumerate(vals):
        s = max(0, s + v - 100)
        assert out[i * W] == (s, s > 150), i
