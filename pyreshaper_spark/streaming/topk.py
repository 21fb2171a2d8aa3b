"""Streaming per-bucket top-k tokens — the streaming face of
``operators.vocab.token_topk``.

Per source the state holds the OPEN bucket's token→count map (bounded
by the vocabulary, independent of row rate) plus a late-row counter.
The arrival of a row for a later bucket closes the open one: its
counts are ranked (count desc, token asc — the batch operator's exact
deterministic order) and the top ``k`` rows are emitted append-mode as
``(source, bucket_s, token, cnt, rank)``. Rows for buckets older than
the open one are counted late and dropped — the same watermark
contract as the rate/quota/anomaly streams.

Batch parity: on an in-order stream the emitted rows equal batch
``token_topk`` restricted to buckets strictly BEFORE each source's
final (still-open) bucket — the closed-bucket oracle contract.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "source string, bucket_s long, token long, cnt long, rank long"
)
STATE_SCHEMA = (
    "toks array<long>, cnts array<long>, open_bucket long, late_rows long"
)


def topk_fn(width_s: int, k: int):
    """Worker factory (bucket width + k baked in)."""

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        if state.exists:
            toks, cnts, ob, late = state.get
            counts = dict(zip(toks, cnts))
        else:
            counts, ob, late = {}, None, 0
        out: list[tuple] = []

        def close_open() -> None:
            ranked = sorted(counts.items(), key=lambda tc: (-tc[1], tc[0]))
            for rank, (t, c) in enumerate(ranked[:k], start=1):
                out.append((source, ob, int(t), int(c), rank))
            counts.clear()

        for pdf in pdfs:
            if not len(pdf):
                continue
            b = (pdf["event_s"] // width_s) * width_s
            grouped = pdf.groupby([b, "token"]).size()
            for (bucket, token), c in sorted(grouped.items()):
                bucket, token, c = int(bucket), int(token), int(c)
                if ob is None:
                    ob = bucket
                if bucket < ob:
                    late += c
                    continue
                if bucket > ob:
                    close_open()
                    ob = bucket
                counts[token] = counts.get(token, 0) + c
        state.update(
            (list(counts.keys()), list(counts.values()), ob, late)
        )
        if out:
            yield pd.DataFrame(
                out,
                columns=["source", "bucket_s", "token", "cnt", "rank"],
            )

    return _fn


def streaming_topk(
    tok_stream: DataFrame, width_s: int, k: int
) -> DataFrame:
    """token stream → append-mode top-k rows per closed bucket."""
    prepared = tok_stream.select("source", "event_s", "token")
    return prepared.groupBy("source").applyInPandasWithState(
        topk_fn(width_s, k),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
