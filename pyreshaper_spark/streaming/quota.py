"""Streaming quota-crossing alerts — the streaming face of
``operators.rollup.quota_cross``.

Per source the state holds exactly (cum, crossed, open_bucket,
open_sum, late_rows) — O(sources), independent of row rate. Rows
accumulate into the currently-open time bucket; the arrival of a row
for a LATER bucket closes the open one, folds it into the running
cumulative total, and — the FIRST time that total reaches the quota —
emits one append-mode alert row ``(source, cross_bucket_s,
cum_at_cross)``. After crossing, the state keeps draining buckets but
never emits again (the alert fires exactly once per source). Rows for
buckets older than the open one are counted as late and dropped — the
watermark contract, mirrored from ``streaming.rate``.

Batch parity: on an in-order stream the emitted rows equal batch
``quota_cross`` over tier-0 restricted to crossings strictly BEFORE
each source's final (still-open) bucket — the same closed-bucket
contract as the rate/sessions oracles. A crossing that would only
happen in the final open bucket is not emitted until more data closes
it (alerting semantics: the bucket isn't final yet).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "source string, cross_bucket_s long, cum_at_cross long"
STATE_SCHEMA = (
    "cum long, crossed boolean, open_bucket long, open_sum long, "
    "late_rows long"
)


def quota_fn(width_s: int, quota: int):
    """Worker factory (width + quota baked into the closure)."""

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        if state.exists:
            cum, crossed, ob, osum, late = state.get
        else:
            cum, crossed, ob, osum, late = 0, False, None, 0, 0
        out: list[tuple] = []

        def close_open() -> None:
            nonlocal cum, crossed
            cum += osum
            if not crossed and cum >= quota:
                crossed = True
                out.append((source, ob, cum))

        for pdf in pdfs:
            if not len(pdf):
                continue
            b = (pdf["event_s"] // width_s) * width_s
            for bucket, bsum in sorted(
                pdf.groupby(b)["n_tok"].sum().items()
            ):
                bucket, bsum = int(bucket), int(bsum)
                if ob is None:
                    ob, osum = bucket, bsum
                elif bucket == ob:
                    osum += bsum
                elif bucket < ob:
                    late += int((b == bucket).sum())
                else:
                    close_open()
                    ob, osum = bucket, bsum
        state.update((cum, crossed, ob, osum, late))
        if out:
            yield pd.DataFrame(
                out,
                columns=["source", "cross_bucket_s", "cum_at_cross"],
            )

    return _fn


def streaming_quota(
    seq_stream: DataFrame, width_s: int, quota: int
) -> DataFrame:
    """sequences stream → append-mode first-crossing quota alerts."""
    prepared = seq_stream.select("source", "event_s", "n_tok")
    return prepared.groupBy("source").applyInPandasWithState(
        quota_fn(width_s, quota),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
