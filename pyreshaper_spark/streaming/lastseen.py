"""Stateful streaming last-seen tracker — the streaming face of
``operators.gapfill.staleness``.

Per source the state holds exactly (n_rows, first_s, last_s) — O(sources)
state, independent of row rate — and every micro-batch that touches a
source re-emits that source's updated row (update semantics, suited to
a foreachBatch upsert into a freshness table). Staleness itself
(seconds behind the high-water mark) is derived at READ time by
:func:`staleness_from_lastseen`, because the high-water mark is global
cross-key information a keyed state cannot see.

With static input run under ``availableNow``, the final table must
equal the batch ``staleness`` aggregate — the batch-parity test.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "source string, n_rows long, first_s long, last_s long"
STATE_SCHEMA = "n_rows long, first_s long, last_s long"


def _fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (source,) = key
    if state.exists:
        n, first, last = state.get
    else:
        n, first, last = 0, None, None
    for pdf in pdfs:
        if not len(pdf):
            continue
        n += len(pdf)
        lo, hi = int(pdf["event_s"].min()), int(pdf["event_s"].max())
        first = lo if first is None else min(first, lo)
        last = hi if last is None else max(last, hi)
    state.update((n, first, last))
    yield pd.DataFrame(
        [(source, n, first, last)],
        columns=["source", "n_rows", "first_s", "last_s"],
    )


def streaming_lastseen(seq_stream: DataFrame) -> DataFrame:
    """sequences stream → per-source (n_rows, first_s, last_s) updates."""
    prepared = seq_stream.select("source", "event_s")
    return prepared.groupBy("source").applyInPandasWithState(
        _fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def staleness_from_lastseen(lastseen: DataFrame) -> DataFrame:
    """Freshness report from a materialized last-seen table: adds
    ``staleness_s`` vs the table's high-water mark (same broadcast
    shape as the batch operator)."""
    from pyspark.sql import functions as F

    hw = lastseen.agg(F.max("last_s").alias("hw"))
    return lastseen.crossJoin(F.broadcast(hw)).select(
        "source", "n_rows", "first_s", "last_s",
        (F.col("hw") - F.col("last_s")).cast("long").alias("staleness_s"),
    )
