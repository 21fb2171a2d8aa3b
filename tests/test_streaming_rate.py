"""Streaming bucket-close rate alerts (streaming/rate.py): batch
parity with operators.gapfill.counter_rate on an in-order stream, plus
direct state-machine tests for multi-batch and late-row behavior."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyreshaper_spark.fixtures import sequences_df
from pyreshaper_spark.operators.gapfill import counter_rate
from pyreshaper_spark.operators.rollup import rollup_all_tiers
from pyreshaper_spark.streaming.rate import rate_fn, streaming_rate
from tests.conftest import SF_SMOKE

W = 600


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
        got = list(rate_fn(W)(("s",), iter([pdf]), state))
        if got:
            out.extend(pd.concat(got).to_dict("records"))
    return out, state


def _pdf(rows):
    return pd.DataFrame(rows, columns=["source", "event_s", "n_tok"])


def test_state_machine_closes_buckets_in_order():
    out, st = _run([
        _pdf([("s", 10, 5), ("s", 20, 7), ("s", 610, 1)]),   # closes b0
        _pdf([("s", 1300, 9), ("s", 1250, 2)]),              # closes b600
    ])
    # first closed bucket has null increase; second closed bucket
    # (610 → b600, sum 1) vs prev 12 → reset, increase = 1
    assert out[0]["bucket_s"] == 0 and out[0]["value"] == 12
    assert out[0]["increase"] is None or pd.isna(out[0]["increase"])
    assert out[1]["bucket_s"] == 600 and out[1]["value"] == 1
    assert out[1]["increase"] == 1 and out[1]["reset"]
    # state holds the open bucket 1200 with sum 9+2=11
    pb, ps, ob, osum, late = st.get
    assert (pb, ps, ob, osum, late) == (600, 1, 1200, 11, 0)


def test_state_machine_drops_late_rows():
    out, st = _run([
        _pdf([("s", 0, 1), ("s", 700, 2)]),    # closes b0, opens b600
        _pdf([("s", 90, 9), ("s", 95, 9)]),    # both late (bucket 0 < 600)
        _pdf([("s", 1210, 4)]),                # closes b600
    ])
    assert [r["bucket_s"] for r in out] == [0, 600]
    # late rows never contaminate the closed value
    assert out[1]["value"] == 2 and out[1]["increase"] == 1
    assert st.get[4] == 2  # late_rows counted


def test_monotone_counter_no_reset():
    out, _ = _run([
        _pdf([("s", 0, 5)]), _pdf([("s", 600, 8)]), _pdf([("s", 1200, 9)]),
    ])
    assert [(r["value"], r["increase"], r["reset"]) for r in out] == [
        (5, None, False), (8, 3, False),
    ]


def test_streaming_rate_matches_batch_counter_rate(spark, tmp_path):
    seq = (
        sequences_df(spark, SF_SMOKE)
        .select("source", "event_s", "n_tok")
        .orderBy("event_s")
        .coalesce(1)
        .cache()
    )
    src = str(tmp_path / "src")
    seq.write.parquet(src)

    rows = []

    def sink(batch_df, _epoch):
        rows.extend(batch_df.collect())

    stream = spark.readStream.schema(
        "source string, event_s long, n_tok long"
    ).parquet(src)
    q = (
        streaming_rate(stream, W)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    got = {
        (r["source"], r["bucket_s"]): (r["value"], r["increase"], r["reset"])
        for r in rows
    }
    tier = rollup_all_tiers(seq.withColumn("doc_id", F.lit("x")), [W])[W]
    cr = counter_rate(
        tier.select(
            "source", "bucket_s",
            F.col("sum_n_tok").cast("long").alias("sum_n_tok"),
        )
    )
    # every bucket strictly before each source's open (max) bucket
    last = {
        r["source"]: r["mx"]
        for r in tier.groupBy("source").agg(
            F.max("bucket_s").alias("mx")
        ).collect()
    }
    want = {
        (r["source"], r["bucket_s"]): (
            r["sum_n_tok"], r["increase"], r["reset"]
        )
        for r in cr.collect()
        if r["bucket_s"] < last[r["source"]]
    }
    assert got == want
