"""Streaming Page CUSUM — the streaming face of
``operators.gapfill.cusum_fixed`` (fixed reference level ``mu``).

Per source the state is O(1): the running CUSUM value over closed
buckets, the open bucket accumulator, and a late-row counter — the
recursion S ← max(0, S + (bucket_sum − mu)) needs nothing else, which
is exactly why the FIXED-target form (not the realized-mean
``cusum_detect``) is the streamable one. Rows accumulate into the
currently-open time bucket; a row for a LATER bucket closes the open
one, advances S, and emits ``(source, bucket_s, sum_n_tok, cusum,
flag)``; buckets older than the open one are counted late and dropped
(the same watermark contract as ``streaming.rate`` / ``.anomaly``).

Batch parity: Python ints are arbitrary precision and the recursion
telescopes to the batch operator's running-sum/running-min window
form, so on an in-order stream the emitted rows equal batch
``cusum_fixed`` over tier-0 restricted to buckets strictly BEFORE
each source's final (still-open) bucket — full value-hash oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "source string, bucket_s long, sum_n_tok long, cusum long, "
    "flag boolean"
)
STATE_SCHEMA = "s_cur long, open_bucket long, open_sum long, late_rows long"


def cusum_fn(width_s: int, mu: int, h: int):
    """Worker factory (bucket width + CUSUM target/threshold baked in)."""

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        if state.exists:
            s_cur, ob, osum, late = state.get
        else:
            s_cur, ob, osum, late = 0, None, 0, 0
        out: list[tuple] = []

        def close_open() -> None:
            nonlocal s_cur
            s_cur = max(0, s_cur + (osum - mu))
            out.append((source, ob, osum, s_cur, s_cur > h))

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
        state.update((s_cur, ob, osum, late))
        if out:
            yield pd.DataFrame(
                out,
                columns=["source", "bucket_s", "sum_n_tok", "cusum", "flag"],
            )

    return _fn


def streaming_cusum(
    seq_stream: DataFrame, width_s: int, mu: int, h: int
) -> DataFrame:
    """sequences stream → append-mode per-closed-bucket CUSUM rows."""
    prepared = seq_stream.select("source", "event_s", "n_tok")
    return prepared.groupBy("source").applyInPandasWithState(
        cusum_fn(width_s, mu, h),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
