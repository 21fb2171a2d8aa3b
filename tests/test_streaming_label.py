"""Stream-static interval labeling: batch parity + incremental files +
epoch-partition replay idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyreshaper_spark.operators.gapfill import uptime_islands
from pyreshaper_spark.operators.rangejoin import interval_join
from pyreshaper_spark.operators.rollup import rollup_tier0
from pyreshaper_spark.sources.iceberglite import IcebergLite
from pyreshaper_spark.streaming.label import LABEL_TABLE, start_label_stream

SF = "/root/testdata/sf0.001"


def _labels_set(df):
    return {
        (r["doc_id"], r["source"], r["event_s"], r["start_s"], r["end_s"])
        for r in df.collect()
    }


def test_streaming_label_matches_batch_and_increments(spark, tmp_path):
    from pyreshaper_spark.fixtures import sequences_df

    seq = sequences_df(spark, SF).select(
        "doc_id", "tokens", "n_tok", "source", "event_s"
    )
    hot = rollup_tier0(seq, 3600).filter(F.col("sum_n_tok") > 20)
    wins = uptime_islands(hot, 3600).select(
        "source",
        F.col("up_start").alias("start_s"),
        F.col("up_end").alias("end_s"),
    )
    assert wins.count() > 0  # threshold must bind on the fixture

    part = F.abs(F.xxhash64(F.col("doc_id").cast("string"))) % 2
    seq_path = str(tmp_path / "seq")
    seq.filter(part == 0).write.parquet(seq_path)

    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    sq = start_label_stream(spark, seq_path, wins, out, ck)
    sq.awaitTermination(300)

    cat = IcebergLite(out)
    got1 = _labels_set(cat.read(spark, LABEL_TABLE).drop("_epoch"))
    want1 = _labels_set(
        interval_join(
            seq.filter(part == 0).select("doc_id", "source", "event_s"),
            wins, key="source", point_ts="event_s",
            start_col="start_s", end_col="end_s", chunk_s=3600,
            end_exclusive=True,
        )
    )
    assert got1 == want1 and len(got1) > 0

    # new files arrive; the next availableNow run labels ONLY them —
    # union equals the batch join over the full input
    seq.filter(part == 1).write.mode("append").parquet(seq_path)
    sq2 = start_label_stream(spark, seq_path, wins, out, ck)
    sq2.awaitTermination(300)
    got2 = _labels_set(cat.read(spark, LABEL_TABLE).drop("_epoch"))
    want2 = _labels_set(
        interval_join(
            seq.select("doc_id", "source", "event_s"),
            wins, key="source", point_ts="event_s",
            start_col="start_s", end_col="end_s", chunk_s=3600,
            end_exclusive=True,
        )
    )
    assert got2 == want2 and want1 < want2

    # replay idempotence: re-running with NO new files adds nothing
    # (epoch partitions are overwritten, not appended)
    sq3 = start_label_stream(spark, seq_path, wins, out, ck)
    sq3.awaitTermination(300)
    assert _labels_set(cat.read(spark, LABEL_TABLE).drop("_epoch")) == got2
