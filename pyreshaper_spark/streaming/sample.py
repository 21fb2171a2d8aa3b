"""Streaming bottom-k uniform sampling — the streaming face of
``operators.sampling.sample_k_per_source``.

The bottom-k sketch is the one exact uniform-sample structure that
streams: keeping the k records with the SMALLEST values of a fixed
hash is equivalent to a uniform k-sample without replacement, is
mergeable, rerun-stable, and arrival-order independent — the final
sample over a stream equals the batch sample over the same rows, which
``df.sample``/reservoir-with-RNG schemes cannot promise (they reseed
on retries and depend on arrival order). State per source is exactly
the current k (hash, doc_id, n_chars) triples — O(k·sources),
independent of stream length.

Each micro-batch that changes a source's sample re-emits that source's
FULL current sample (update semantics, suited to a foreachBatch upsert
keyed by source). Hash = the batch operator's own md5-based
``h32(doc_id) % 10000`` with the (rate, doc_id-string) tie-break, so a
run-to-completion sample is row-identical to
``sample_k_per_source`` — the full value-hash oracle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RATE_DEN = 10_000

OUTPUT_SCHEMA = "source string, doc_id string, n_chars long, rk long"
STATE_SCHEMA = (
    "rates array<long>, ids array<string>, chars array<long>"
)


def _rate(doc_id: str) -> int:
    """Pure-Python twin of functions.xhash.h32(doc_id) % RATE_DEN."""
    return (
        int(hashlib.md5(doc_id.encode()).hexdigest()[:8], 16) % RATE_DEN
    )


def sample_fn(k: int):
    """Worker factory (sample size baked into the closure)."""
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        if state.exists:
            rates, ids, chars = state.get
            best = list(zip(rates, ids, chars))
        else:
            best = []
        changed = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                doc_id = str(doc_id)
                cand = (_rate(doc_id), doc_id, int(n_chars))
                best.append(cand)
            changed = True
        if changed:
            # (rate, doc_id-string) total order — the batch tie-break
            best.sort(key=lambda t: (t[0], t[1]))
            best = best[:k]
        state.update((
            [t[0] for t in best],
            [t[1] for t in best],
            [t[2] for t in best],
        ))
        if changed and best:
            yield pd.DataFrame(
                [
                    (source, doc_id, n_chars, rk)
                    for rk, (_, doc_id, n_chars) in enumerate(best, 1)
                ],
                columns=["source", "doc_id", "n_chars", "rk"],
            )

    return _fn


def streaming_sample(docs_stream: DataFrame, k: int) -> DataFrame:
    """documents stream → per-source current bottom-k sample rows."""
    prepared = docs_stream.select("source", "doc_id", "n_chars")
    return prepared.groupBy("source").applyInPandasWithState(
        sample_fn(k),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
