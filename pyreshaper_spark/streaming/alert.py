"""Streaming hysteresis threshold alerts — the streaming face of
``operators.gapfill.alert_hysteresis``.

The batch operator labels history; a live pipeline wants the fire/clear
transition emitted the moment a bucket CLOSES (the Prometheus alert
evaluation loop). Per source the state holds exactly (alert, open
bucket, open sum, late rows) — O(sources), independent of row rate.
Rows accumulate into the currently-open time bucket; the arrival of a
row for a LATER bucket closes the open one, runs the enter-at-hi /
exit-at-lo automaton on its final sum, and emits an append-mode row
carrying the new state and the transition label (null when the state
held — a notifier filters to ``event IS NOT NULL``). Rows for buckets
older than the open one are counted late and dropped; ``late_rows``
on an emitted row is the source's CUMULATIVE late counter captured at
the moment that bucket closed (the watermark contract, as in
streaming_rate).

Batch parity: on an in-order stream the emitted rows equal the batch
``alert_hysteresis`` over tier-0 for every bucket strictly before each
source's open (last) bucket — dropping only the still-open tail cannot
change earlier states, so the prefix matches exactly (the full
value-hash oracle the driver checks).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "source string, bucket_s long, value long, alert long, "
    "event string, late_rows long"
)
STATE_SCHEMA = "alert long, open_bucket long, open_sum long, late_rows long"


def alert_fn(width_s: int, hi: int, lo: int):
    """Worker factory (band baked into the closure)."""
    if not lo <= hi:
        raise ValueError("need lo <= hi for a hysteresis band")

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        if state.exists:
            alert, ob, osum, late = state.get
        else:
            alert, ob, osum, late = 0, None, None, 0
        closed: list[tuple] = []

        def close_open(new_bucket, new_sum) -> None:
            nonlocal alert, ob, osum
            if ob is not None:
                prev = alert
                if osum >= hi:
                    alert = 1
                elif osum <= lo:
                    alert = 0
                if alert == 1 and prev == 0:
                    event = "fire"
                elif alert == 0 and prev == 1:
                    event = "clear"
                else:
                    event = None
                # late counter captured AT CLOSE TIME: a row closed
                # before late arrivals in the same micro-batch must
                # not retroactively report them
                closed.append((source, ob, osum, alert, event, late))
            ob, osum = new_bucket, new_sum

        for pdf in pdfs:
            if not len(pdf):
                continue
            b = (pdf["event_s"] // width_s) * width_s
            for bucket, bsum in sorted(
                pdf.groupby(b)["n_tok"].sum().items()
            ):
                bucket, bsum = int(bucket), int(bsum)
                if ob is None or bucket == ob:
                    osum = bsum if ob is None else osum + bsum
                    ob = bucket
                elif bucket < ob:
                    late += int((b == bucket).sum())
                else:
                    close_open(bucket, bsum)
        state.update((alert, ob, osum, late))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "source", "bucket_s", "value", "alert", "event",
                    "late_rows",
                ],
            )

    return _fn


def streaming_alert(
    seq_stream: DataFrame, width_s: int = 600, hi: int = 70, lo: int = 40
) -> DataFrame:
    """sequences stream → append-mode closed-bucket hysteresis alerts."""
    prepared = seq_stream.select("source", "event_s", "n_tok")
    return prepared.groupBy("source").applyInPandasWithState(
        alert_fn(width_s, hi, lo),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
