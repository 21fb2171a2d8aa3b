"""Stream-static interval labeling — incident windows applied in flight.

The streaming face of :func:`operators.rangejoin.interval_join`: facts
arrive as a stream and are labeled with the static window containing
their event time (ops teams tag incoming points with known incident /
maintenance windows without waiting for the batch pipeline). The join
is STATELESS — a stream-static equi-join on (key, chunk) with the
exact range predicate as a residual filter — so it needs no watermark,
no state store, and scales exactly like the batch plan: the static
window side (exploded to chunks) broadcasts or hash-joins per
micro-batch.

Sink discipline: each micro-batch lands in its own ``_epoch`` hive
partition via ``overwrite_partitions`` — a replayed epoch after a crash
rewrites the SAME partition with identical content (file-source
batches are deterministic), so the output is idempotent end to end,
the same replay contract as the tier-0 ingest sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from pyreshaper_spark.operators.rangejoin import interval_join
from pyreshaper_spark.sources.catalog import get_catalog
from pyreshaper_spark.streaming.ingest import read_sequences_stream

LABEL_TABLE = "labels_stream"


def streaming_interval_label(
    stream: DataFrame,
    windows: DataFrame,
    chunk_s: int,
    time_col: str = "event_s",
    key: str = "source",
) -> DataFrame:
    """Label streamed facts with their containing half-open window —
    the batch operator applied verbatim; stream-static joins keep the
    plan stateless."""
    return interval_join(
        stream, windows, key=key, point_ts=time_col,
        start_col="start_s", end_col="end_s", chunk_s=chunk_s,
        end_exclusive=True,
    )


def start_label_stream(
    spark: SparkSession,
    seq_path: str,
    windows: DataFrame,
    out_root: str,
    checkpoint_dir: str,
    chunk_s: int = 3600,
    available_now: bool = True,
) -> StreamingQuery:
    """Run the labeling stream into an IcebergLite table
    (``labels_stream``), one idempotent ``_epoch`` partition per
    micro-batch."""
    cat = get_catalog(out_root)
    labeled = streaming_interval_label(
        read_sequences_stream(spark, seq_path).select(
            "doc_id", "source", "event_s"
        ),
        windows, chunk_s,
    )

    # create-before-stream: a drained-empty backlog still leaves a
    # typed (zero-row) table for downstream readers
    cat.create_table(
        LABEL_TABLE, labeled.withColumn("_epoch", F.lit(0)).schema.json()
    )

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            # an epoch whose files have no in-window rows contributes
            # no partition (overwrite of an absent partition is a no-op
            # anyway, but skip the empty write entirely)
            return
        out = batch_df.withColumn("_epoch", F.lit(int(epoch_id)))
        cat.overwrite_partitions(LABEL_TABLE, out, ("_epoch",))

    writer = labeled.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
