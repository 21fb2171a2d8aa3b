"""Structured Streaming ingest: continuous tier-0 aggregates.

The reference is batch-only (SURVEY.md §2.2 — "streaming ops: none"),
but a training-data rollup engine at 10^12 sequences ingests
continuously. This module is the streaming twin of
``operators.rollup.rollup_tier0``:

    readStream (file source over the sequences table dir)
      → derive event_ts
      → withWatermark("event_ts", delay)
      → groupBy(source, window(event_ts, width)) .agg(count/sum/min/max)
      → foreachBatch: MERGE the per-batch partial aggregate into the
        tier table via IcebergLite overwrite_partitions (idempotent
        per epoch — replayed epochs rewrite the same partitions)

Design notes for scale:

* The windowed aggregation is Spark's native streaming state store —
  partial aggregates per (source, window), watermark evicts state;
  state size is O(sources × open windows), independent of row rate.
* Late data beyond the watermark is DROPPED by Spark (counted via the
  streaming progress metrics) — mirroring the reference's hard
  monotonicity stance, but bounded instead of fatal.
* ``availableNow`` triggers give batch-incremental runs (the streaming
  analog of resume-from-checkpoint): each invocation processes exactly
  the files not yet seen, tracked in the Spark checkpoint dir.
* The cascade tiers stay BATCH re-aggregations of tier 0 (exactly the
  continuous-aggregate refresh model): streaming keeps the freshest
  tier hot; coarser tiers recompute from it on schedule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from pyreshaper_spark.sources.catalog import get_catalog

SEQ_SCHEMA = (
    "doc_id string, tokens array<int>, n_tok int, source string, event_s long"
)


def read_sequences_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over a sequences parquet directory."""
    return (
        spark.readStream.schema(SEQ_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
    )


def streaming_tier0(
    stream: DataFrame,
    width_s: int,
    watermark: str = "10 minutes",
    slide_s: int | None = None,
) -> DataFrame:
    """Watermarked windowed continuous aggregate (streaming tier 0).

    ``slide_s`` < ``width_s`` turns the tumbling window into Spark's
    native HOPPING window (each event enters width/slide overlapping
    windows; state remains O(sources × open windows)); ``bucket_s``
    is then the window START — the same key the batch
    :func:`~pyreshaper_spark.operators.rollup.hopping_rollup` emits.
    """
    with_ts = stream.withColumn("event_ts", F.timestamp_seconds("event_s"))
    win = (
        F.window("event_ts", f"{width_s} seconds", f"{slide_s} seconds")
        if slide_s
        else F.window("event_ts", f"{width_s} seconds")
    )
    return (
        with_ts.withWatermark("event_ts", watermark)
        .groupBy("source", win.alias("win"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum("n_tok").alias("sum_n_tok"),
            F.min("n_tok").alias("min_n_tok"),
            F.max("n_tok").alias("max_n_tok"),
        )
        .select(
            "source",
            F.unix_timestamp("win.start").alias("bucket_s"),
            "cnt",
            "sum_n_tok",
            "min_n_tok",
            "max_n_tok",
        )
    )


def start_tier0_stream(
    spark: SparkSession,
    seq_path: str,
    out_root: str,
    checkpoint_dir: str,
    width_s: int = 60,
    available_now: bool = True,
    slide_s: int | None = None,
    table: str = "tier_stream",
) -> StreamingQuery:
    """Run the streaming tier-0 ingest into an IcebergLite table.

    ``available_now=True`` processes the current backlog and stops —
    the incremental-batch pattern; leave False for continuous mode.
    Each micro-batch merges via overwrite_partitions keyed by source,
    so epoch replay after failure is idempotent.
    """
    cat = get_catalog(out_root)
    tier = streaming_tier0(
        read_sequences_stream(spark, seq_path), width_s, slide_s=slide_s
    )
    # create-before-stream: a drained-empty backlog still leaves a
    # typed (zero-row) table for downstream readers
    cat.create_table(table, tier.withColumn("epoch", F.lit(0)).schema.json())

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        updated = batch_df.withColumn("epoch", F.lit(epoch_id))
        # merge: replace only the (source) partitions present in this
        # epoch — update-mode batches re-emit full per-window rows, so
        # combining old+new per key keeps exact aggregates. The table
        # always exists (create-before-stream above), so there is no
        # separate first-write path.
        existing = cat.read(
            batch_df.sparkSession, table, allow_empty=True
        )
        srcs = [r["source"] for r in updated.select("source").distinct().collect()]
        keep_new = existing.filter(F.col("source").isin(srcs)).unionByName(
            updated
        )
        # newest epoch wins per (source, bucket) — struct max is
        # deterministic, unlike last() over an unordered union
        merged = (
            keep_new.groupBy("source", "bucket_s")
            .agg(
                F.max(
                    F.struct(
                        "epoch", "cnt", "sum_n_tok", "min_n_tok", "max_n_tok"
                    )
                ).alias("s")
            )
            .select(
                "source", "bucket_s", "s.cnt", "s.sum_n_tok",
                "s.min_n_tok", "s.max_n_tok", "s.epoch",
            )
        )
        cat.overwrite_partitions(table, merged, ("source",))

    writer = (
        tier.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_sink)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def refresh_cascade(
    spark: SparkSession,
    out_root: str,
    widths: list[int],
    base_table: str = "tier_stream",
) -> dict[int, int]:
    """Continuous-aggregate refresh for the coarser tiers: re-aggregate
    the streaming tier-0 table up the cascade and commit each tier
    (the TimescaleDB refresh-policy analog — streaming keeps tier 0
    hot, this runs on schedule). Each refresh reads only the tier
    below, never raw data. Returns {width_s: snapshot_id}."""
    from pyreshaper_spark.operators.rollup import rollup_cascade

    cat = get_catalog(out_root)
    prev = cat.read(spark, base_table, allow_empty=True).select(
        "source", "bucket_s", "cnt", "sum_n_tok", "min_n_tok", "max_n_tok"
    )
    sids: dict[int, int] = {}
    for w in widths:
        tier = rollup_cascade(prev, w)
        sids[w] = cat.overwrite(f"tier_stream_{w}", tier, ("source",))
        prev = cat.read(spark, f"tier_stream_{w}", allow_empty=True)
    return sids
