"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (the brief's designated mechanism for
operators Structured Streaming lacks natively).

Semantics match the batch ``operators.events.sessionize``: a silence
longer than ``gap_s`` closes a session. Per user the state holds ONLY
the open session (session_idx, first_ep, last_ep, n_events) — O(users)
state, independent of event rate. Closed sessions are emitted in
append mode: on an in-batch gap, or when the state times out
(processing-time timeout ⇒ the open session is flushed and the state
removed).

Scale shape: one shuffle on ``user_id`` per micro-batch; the pandas
group sees only that batch's events for the user (sorted here — order
across batches is the stream's responsibility, late events beyond a
batch are the watermark's problem upstream).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_S = 1800

OUTPUT_SCHEMA = (
    "user_id long, session_idx long, n_events long, "
    "first_ep long, last_ep long"
)
STATE_SCHEMA = "session_idx long, first_ep long, last_ep long, n_events long"


def _make_fn(gap_s: int, timeout_ms: int | None):
    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int, int, int]] = []

        if state.hasTimedOut:
            if state.exists:
                idx, first, last, n = state.get
                closed.append((user_id, idx, n, first, last))
            state.remove()
        else:
            if state.exists:
                idx, first, last, n = state.get
            else:
                idx, first, last, n = 0, None, None, 0
            eps: list[int] = []
            for pdf in pdfs:
                eps.extend(int(x) for x in pdf["ep"])
            eps.sort()
            for ep in eps:
                if last is not None and ep - last > gap_s:
                    closed.append((user_id, idx, n, first, last))
                    first, n = ep, 0
                    idx += 1
                if first is None:
                    first, idx = ep, 1
                last = ep
                n += 1
            state.update((idx, first, last, n))
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)

        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id", "session_idx", "n_events", "first_ep", "last_ep",
                ],
            )

    return fn


def streaming_sessionize(
    events_stream: DataFrame,
    gap_s: int = SESSION_GAP_S,
    timeout_ms: int | None = None,
) -> DataFrame:
    """events stream (must carry user_id + ts) → closed-session stream.

    ``timeout_ms`` enables processing-time state timeout (open sessions
    flushed after silence) for continuous deployments; leave ``None``
    for availableNow/incremental runs, where open sessions simply stay
    in state for the next invocation.
    """
    from pyspark.sql import functions as F

    prepared = events_stream.select(
        "user_id", F.unix_timestamp("ts").alias("ep")
    )
    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _make_fn(gap_s, timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )
