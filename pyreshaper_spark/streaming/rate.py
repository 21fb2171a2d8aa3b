"""Streaming bucket-close rate alerts — the streaming face of
``operators.gapfill.counter_rate``.

Per source the state holds exactly (prev_bucket, prev_sum, open_bucket,
open_sum, late_rows) — O(sources), independent of row rate. Rows
accumulate into the currently-open time bucket; the arrival of a row
for a LATER bucket closes the open one, emitting an append-mode alert
row with the reset-corrected increase vs the previously closed bucket
(PromQL ``increase`` semantics, exactly the batch ``counter_rate``).
Rows for buckets older than the open one are counted as late and
dropped — the watermark contract, surfaced in ``late_rows`` instead of
silently vanishing.

Append output (only CLOSED buckets emit, exactly once per source) is
the right shape for an alerting sink. Batch parity: on an in-order
stream the emitted rows equal batch ``counter_rate`` over tier-0 for
every bucket strictly before each source's open (last) bucket — the
pytest gate; the multi-batch / late-row state machine is unit-tested
on the pure worker function.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "source string, bucket_s long, value long, increase long, "
    "reset boolean, late_rows long"
)
STATE_SCHEMA = (
    "prev_bucket long, prev_sum long, open_bucket long, open_sum long, "
    "late_rows long"
)


def rate_fn(width_s: int):
    """Worker factory (width baked into the closure)."""

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        if state.exists:
            pb, ps, ob, osum, late = state.get
        else:
            pb = ps = ob = osum = None
            late = 0
        closed: list[tuple] = []

        def close_open(new_bucket: int, new_sum: int) -> None:
            nonlocal pb, ps, ob, osum
            if ob is not None:
                if ps is None:
                    inc, reset = None, False
                elif osum < ps:
                    inc, reset = osum, True
                else:
                    inc, reset = osum - ps, False
                closed.append((source, ob, osum, inc, reset))
                pb, ps = ob, osum
            ob, osum = new_bucket, new_sum

        for pdf in pdfs:
            if not len(pdf):
                continue
            b = (pdf["event_s"] // width_s) * width_s
            for bucket, grp in sorted(
                pdf.groupby(b)["n_tok"].sum().items()
            ):
                bucket, bsum = int(bucket), int(grp)
                if ob is None or bucket == ob:
                    osum = bsum if ob is None else osum + bsum
                    ob = bucket
                elif bucket < ob:
                    late += int((b == bucket).sum())
                else:
                    close_open(bucket, bsum)
        state.update((pb, ps, ob, osum, late))
        if closed:
            yield pd.DataFrame(
                [(*c, late) for c in closed],
                columns=[
                    "source", "bucket_s", "value", "increase", "reset",
                    "late_rows",
                ],
            )

    return _fn


def streaming_rate(seq_stream: DataFrame, width_s: int = 600) -> DataFrame:
    """sequences stream → append-mode closed-bucket rate alerts."""
    prepared = seq_stream.select("source", "event_s", "n_tok")
    return prepared.groupBy("source").applyInPandasWithState(
        rate_fn(width_s),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
