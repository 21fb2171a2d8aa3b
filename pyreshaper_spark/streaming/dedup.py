"""Streaming exact deduplication — first-seen-wins over a content key.

The streaming face of ``operators.dedup.exact_dup_groups``: an ingest
firehose where only the FIRST arrival of each distinct content payload
may pass (the batch operator reports duplicate groups after the fact;
a live pipeline wants them never written). Two layers, each doing the
job the other cannot:

1. **In-stream**: ``dropDuplicatesWithinWatermark`` on the content key
   — Spark's state store drops re-arrivals within the watermark
   horizon, and the watermark EVICTS state, so hot-path state is
   O(keys per horizon), independent of stream lifetime. (Global
   ``dropDuplicates`` in a stream never evicts — unusable at 10^12
   rows.)
2. **Cross-horizon, in the sink**: each micro-batch left-anti-joins
   against the live sink table's key column before appending. This
   catches duplicates farther apart than the watermark AND makes epoch
   replay after a crash idempotent for free (a replayed batch's keys
   are already in the table, so the anti-join drops them) — the same
   live-table-derived-pending discipline as the batch pipeline's
   append mode. The anti-join probes only the pruned ``content_key``
   column of the sink (column-pruned scan, hash equi-join).

Which document survives a duplicate group is arrival-order-dependent
(inherent to streaming first-wins); the KEY SET and row counts are
exact and batch-verifiable — the parity the test asserts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from pyreshaper_spark.sources.catalog import get_catalog
from pyreshaper_spark.streaming.ingest import read_sequences_stream

DEDUP_TABLE = "seq_dedup"


def content_key(tokens_col: str = "tokens") -> Column:
    """Deterministic content hash of the token payload (md5 of the
    canonical string rendering — cross-engine stable, cheap)."""
    return F.md5(F.col(tokens_col).cast("string"))


def dedup_stream(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Watermarked first-seen pass-through: one row per content key per
    watermark horizon, state evicted as event time advances."""
    return (
        stream.withColumn("event_ts", F.timestamp_seconds("event_s"))
        .withColumn("content_key", content_key())
        .withWatermark("event_ts", watermark)
        .dropDuplicatesWithinWatermark(["content_key"])
        .select(
            "doc_id", "source", "n_tok", "event_s", "content_key"
        )
    )


def start_dedup_stream(
    spark: SparkSession,
    seq_path: str,
    out_root: str,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
    available_now: bool = True,
) -> StreamingQuery:
    """Run the streaming dedup into an IcebergLite table: in-stream
    watermarked dedup + sink-side anti-join append (exact global key
    uniqueness, crash-idempotent)."""
    cat = get_catalog(out_root)
    deduped = dedup_stream(read_sequences_stream(spark, seq_path), watermark)
    # create-before-stream: a drained-empty backlog still leaves a
    # typed (zero-row) table for downstream readers
    cat.create_table(DEDUP_TABLE, deduped.schema.json())

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # defensive in-batch collapse (deterministic min-doc survivor)
        fresh = (
            batch_df.groupBy("content_key")
            .agg(
                F.min(
                    F.struct("doc_id", "source", "n_tok", "event_s")
                ).alias("s")
            )
            .select(
                "s.doc_id", "s.source", "s.n_tok", "s.event_s", "content_key"
            )
        )
        # the table always exists (create-before-stream above): anti-join
        # against the seen keys and append — no separate first-write path
        seen = cat.read(
            batch_df.sparkSession, DEDUP_TABLE, allow_empty=True
        ).select("content_key")
        fresh = fresh.join(seen, "content_key", "left_anti")
        if fresh.isEmpty():
            return
        cat.append(DEDUP_TABLE, fresh, ("source",))

    writer = (
        deduped.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_sink)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
