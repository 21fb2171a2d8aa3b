"""Exactly-once raw streaming append into an IcebergLite table.

``ingest.start_tier0_stream`` lands AGGREGATES (idempotent via
partition overwrite + newest-epoch-wins). This module is the other half
a lakehouse ingest needs: landing the RAW rows themselves — the
"streaming append to an Iceberg table" pattern — with exactly-once
semantics from COMMIT DEDUP rather than merge logic: every micro-batch
commits under the key ``<sink_id>:<epoch_id>``; a replayed epoch (task
retry, driver restart replaying an uncheckpointed batch) finds its own
earlier snapshot by key and no-ops before writing any data
(:meth:`IcebergLite.append_once`).

Scale notes: the sink is append-only — no read-modify-write of existing
data, so commit cost is O(batch) regardless of table size; downstream
consumers get change-data via ``read_changes`` between the snapshots
the sink produces, and table maintenance (compaction, retention,
expiry) runs independently via the maintain CLI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from pyreshaper_spark.sources.catalog import get_catalog
from pyreshaper_spark.streaming.ingest import read_sequences_stream


def make_append_sink(
    out_root: str,
    table: str,
    sink_id: str,
    partition_by: tuple[str, ...] = ("source",),
):
    """foreachBatch function committing each epoch exactly once."""
    cat = get_catalog(out_root)

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        # no isEmpty() pre-scan: that is an extra Spark action per
        # micro-batch (the batch source recomputed before the real
        # write). append_once detects an empty epoch from the written
        # file list and skips the commit itself.
        cat.append_once(
            table,
            batch_df,
            key=f"{sink_id}:{epoch_id}",
            partition_by=partition_by,
        )

    return _sink


def start_raw_append_stream(
    spark: SparkSession,
    seq_path: str,
    out_root: str,
    checkpoint_dir: str,
    table: str = "sequences_raw",
    sink_id: str = "raw-append",
    available_now: bool = True,
) -> StreamingQuery:
    """Stream the sequences file source into an IcebergLite table,
    appending each micro-batch exactly once (commit-key dedup survives
    epoch replay). ``available_now=True`` drains the current backlog
    and stops — the incremental-batch ingest pattern."""
    stream = read_sequences_stream(spark, seq_path)
    # create-before-stream: a drained-empty backlog still leaves a
    # typed (zero-row) table for downstream readers
    get_catalog(out_root).create_table(table, stream.schema.json())
    writer = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(make_append_sink(out_root, table, sink_id))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
