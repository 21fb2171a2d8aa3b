"""Streaming anomaly z-flags — the streaming face of
``operators.gapfill.anomaly_zflag``.

Per source the state holds the last ``k`` CLOSED bucket sums (plus the
open bucket accumulator and a late-row counter) — O(sources × k),
independent of row rate. Rows accumulate into the currently-open time
bucket; the arrival of a row for a LATER bucket closes the open one,
which is scored against the trailing window of previously-closed sums
with the batch operator's EXACT integer z-test

    (v·n − s)²·z_den² > z_num²·(n·ss − s²)

(Python ints are arbitrary precision, so this matches the batch
decimal(38,0) arithmetic bit-for-bit) and emitted as one append-mode
row ``(source, bucket_s, sum_n_tok, roll_n, is_anomaly)``. Buckets
older than the open one are counted late and dropped — the same
watermark contract as ``streaming.rate`` / ``streaming.quota``.

Batch parity: on an in-order stream the emitted rows equal batch
``anomaly_zflag`` over tier-0 restricted to buckets strictly BEFORE
each source's final (still-open) bucket — the standard closed-bucket
oracle contract. The trailing window skips missing buckets in both
formulations (it is a row frame over EXISTING tier rows, not a time
range), so gaps never misalign the comparison.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "source string, bucket_s long, sum_n_tok long, roll_n long, "
    "is_anomaly boolean"
)
STATE_SCHEMA = (
    "sums array<long>, open_bucket long, open_sum long, late_rows long"
)


def anomaly_fn(
    width_s: int,
    k: int = 6,
    z_num: int = 3,
    z_den: int = 1,
    min_n: int = 3,
):
    """Worker factory (window width + z-test knobs baked in)."""

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        if state.exists:
            sums, ob, osum, late = state.get
            sums = list(sums)
        else:
            sums, ob, osum, late = [], None, 0, 0
        out: list[tuple] = []

        def close_open() -> None:
            n = len(sums)
            s = sum(sums)
            ss = sum(x * x for x in sums)
            dev = osum * n - s
            flag = n >= min_n and (
                dev * dev * z_den * z_den > z_num * z_num * (n * ss - s * s)
            )
            out.append((source, ob, osum, n, flag))
            sums.append(osum)
            del sums[:-k]

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
        state.update((sums, ob, osum, late))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "source", "bucket_s", "sum_n_tok", "roll_n",
                    "is_anomaly",
                ],
            )

    return _fn


def streaming_anomaly(
    seq_stream: DataFrame,
    width_s: int,
    k: int = 6,
    z_num: int = 3,
    z_den: int = 1,
    min_n: int = 3,
) -> DataFrame:
    """sequences stream → append-mode per-closed-bucket anomaly rows."""
    prepared = seq_stream.select("source", "event_s", "n_tok")
    return prepared.groupBy("source").applyInPandasWithState(
        anomaly_fn(width_s, k=k, z_num=z_num, z_den=z_den, min_n=min_n),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
