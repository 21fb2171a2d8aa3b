"""Stateful streaming last-seen tracker vs the batch staleness
aggregate: two incremental availableNow runs over time-split slabs,
update rows upserted via foreachBatch (the documented consumption
pattern), final table must equal the batch operator exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyreshaper_spark.fixtures import sequences_df
from pyreshaper_spark.operators.gapfill import staleness
from pyreshaper_spark.streaming.lastseen import (
    staleness_from_lastseen,
    streaming_lastseen,
)
from tests.conftest import SF_SMOKE


def test_streaming_lastseen_matches_batch(spark, tmp_path):
    seq = sequences_df(spark, SF_SMOKE).select("source", "event_s").cache()
    mid = seq.approxQuantile("event_s", [0.5], 0.0)[0]
    slabs = [
        seq.filter(F.col("event_s") < mid),
        seq.filter(F.col("event_s") >= mid),
    ]

    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    table: dict[str, tuple] = {}

    def upsert(batch_df, _epoch):
        for r in batch_df.collect():
            table[r["source"]] = (r["n_rows"], r["first_s"], r["last_s"])

    for slab in slabs:
        slab.write.mode("append").parquet(src)
        stream = spark.readStream.schema("source string, event_s long").parquet(
            src
        )
        q = (
            streaming_lastseen(stream)
            .writeStream.outputMode("update")
            .foreachBatch(upsert)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    expect = {
        r["source"]: (r["n_rows"], r["first_s"], r["last_s"])
        for r in staleness(seq.withColumn("n_tok", F.lit(1))).collect()
    }
    assert table == expect

    # staleness derivation over the materialized table matches batch
    final = spark.createDataFrame(
        [(s, *v) for s, v in table.items()],
        "source string, n_rows long, first_s long, last_s long",
    )
    got = {
        r["source"]: r["staleness_s"]
        for r in staleness_from_lastseen(final).collect()
    }
    want = {
        r["source"]: r["staleness_s"] for r in staleness(seq).collect()
    }
    assert got == want
