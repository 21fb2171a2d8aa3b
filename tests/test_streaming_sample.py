"""Streaming bottom-k sampling (streaming/sample.py): state-machine
unit tests (merge, truncation, order independence) and multi-batch
parity with the batch operator."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from pyreshaper_spark.streaming.sample import _rate, sample_fn
from tests.conftest import SF_SMOKE

K = 3


class _FakeState:
    def __init__(self):
        self._v, self.exists = None, False

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v, self.exists = v, True


def _run(batches, state=None, k=K):
    state = state or _FakeState()
    out = []
    for pdf in batches:
        got = list(sample_fn(k)(("s",), iter([pdf]), state))
        out.append(
            pd.concat(got).to_dict("records") if got else []
        )
    return out, state


def _pdf(ids):
    return pd.DataFrame(
        [(i, len(i)) for i in ids], columns=["doc_id", "n_chars"]
    )


def test_bottom_k_merges_across_batches_and_truncates():
    ids = [str(i) for i in range(10)]
    emits, st = _run([_pdf(ids[:5]), _pdf(ids[5:])])
    # the final emitted sample is the k globally-smallest (rate, id)
    want = sorted(((_rate(i), i) for i in ids))[:K]
    got = [(r["doc_id"], r["rk"]) for r in emits[-1]]
    assert got == [(i, rk) for rk, (_, i) in enumerate(want, 1)]
    # state holds exactly k entries
    rates, sids, chars = st.get
    assert len(sids) == K and sids == [i for _, i in want]


def test_bottom_k_is_arrival_order_independent():
    ids = [str(i) for i in range(20)]
    fwd, _ = _run([_pdf(ids[:10]), _pdf(ids[10:])])
    rev, _ = _run([_pdf(list(reversed(ids))[:10]),
                   _pdf(list(reversed(ids))[10:])])
    assert fwd[-1] == rev[-1]


def test_bottom_k_silent_batch_emits_nothing():
    emits, _ = _run([_pdf(["a", "b", "c", "d"]), _pdf([])])
    assert emits[1] == []


def test_sample_fn_rejects_bad_k():
    with pytest.raises(ValueError):
        sample_fn(0)


def test_streaming_sample_multibatch_equals_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from pyreshaper_spark.operators.sampling import sample_k_per_source
    from pyreshaper_spark.streaming.sample import streaming_sample

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    src = str(tmp_path / "src")
    docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
    ).repartition(4).write.parquet(src)

    table: dict[str, list] = {}
    n_batches = {"n": 0}

    def upsert(batch_df, _epoch):
        n_batches["n"] += 1
        for r in batch_df.collect():
            table.setdefault(r["source"], {})
        by_src: dict[str, list] = {}
        for r in batch_df.collect():
            by_src.setdefault(r["source"], []).append(
                (r["doc_id"], r["n_chars"], r["rk"])
            )
        table.update(by_src)

    stream = (
        spark.readStream.schema("doc_id string, source string, n_chars long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sq = (
        streaming_sample(stream, k=5)
        .writeStream.outputMode("update")
        .foreachBatch(upsert)
        .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination(300)
    assert n_batches["n"] >= 2

    got = {
        (s, doc_id, n_chars, rk)
        for s, rows in table.items()
        for (doc_id, n_chars, rk) in rows
    }
    want = {
        (r["source"], r["doc_id"], r["n_chars"], r["rk"])
        for r in sample_k_per_source(docs, 5).collect()
    }
    assert got == want and got
