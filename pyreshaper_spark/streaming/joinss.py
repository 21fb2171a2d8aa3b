"""Stream-stream time-bounded join — the event-correlation primitive.

Two live event streams correlated in flight: every left event is
paired with the right-stream events of the same key whose event time
falls inside ``[t, t + tol_s]`` (deploy markers × error spikes, config
pushes × traffic shifts). This is Spark Structured Streaming's
watermarked stream-stream inner join: both sides declare an event-time
watermark and the join condition carries the time-range predicate, so
the state store can evict a buffered row as soon as the other side's
watermark passes its match window — state is bounded by
``rate × (tol_s + watermark delay)`` per side, never by stream length.

Scale shape: the join keys on the equality column(s), so Spark
partitions both sides by key — the time-range predicate is evaluated
within the co-partitioned state store, no cross-partition work. The
output of an inner join in append mode is emitted as soon as a match
arrives (matches never retract), which is why ONLY the inner join
needs no closure bookkeeping in the oracle: run to completion over a
static fixture, the result is exactly the batch join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_time_join(
    left: DataFrame,
    right: DataFrame,
    tol_s: int,
    key: str = "source",
    time_col: str = "event_s",
    watermark_s: int | None = None,
) -> DataFrame:
    """Inner-join two event streams on ``key`` with the right event in
    ``[left.t, left.t + tol_s]``. Non-key, non-time columns are
    prefixed ``l_`` / ``r_``; the epoch-second event times come back
    as ``l_event_s`` / ``r_event_s``.

    Works identically on batch DataFrames (watermarks are a no-op
    there) — the batch twin IS the oracle.
    """
    wm = watermark_s if watermark_s is not None else 2 * tol_s

    def _side(df: DataFrame, p: str) -> DataFrame:
        cols = [
            F.col(c).alias(f"{p}_{c}")
            for c in df.columns
            if c not in (key, time_col)
        ]
        out = df.select(
            F.col(key),
            F.col(time_col).cast("long").alias(f"{p}_{time_col}"),
            F.timestamp_seconds(F.col(time_col)).alias(f"{p}_ts"),
            *cols,
        )
        if df.isStreaming:
            out = out.withWatermark(f"{p}_ts", f"{wm} seconds")
        return out

    lt = _side(left, "l")
    rt = _side(right, "r").withColumnRenamed(key, f"r_{key}")
    cond = (
        (F.col(key) == F.col(f"r_{key}"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {tol_s} SECONDS"))
    )
    return (
        lt.join(rt, cond, "inner")
        .drop(f"r_{key}", "l_ts", "r_ts")
    )


def time_join_sql(
    left_rel: str,
    right_rel: str,
    tol_s: int,
    key: str = "source",
    time_col: str = "event_s",
    value_cols: tuple[str, ...] = ("n_tok",),
) -> str:
    """DuckDB twin of :func:`streaming_time_join` over two named
    relations carrying (key, time_col, value_cols...)."""
    lsel = ", ".join(f"l.{c} AS l_{c}" for c in value_cols)
    rsel = ", ".join(f"r.{c} AS r_{c}" for c in value_cols)
    return f"""
SELECT l.{key} AS {key},
       CAST(l.{time_col} AS BIGINT) AS l_{time_col},
       CAST(r.{time_col} AS BIGINT) AS r_{time_col},
       {lsel}, {rsel}
FROM {left_rel} l
JOIN {right_rel} r
  ON l.{key} = r.{key}
 AND r.{time_col} >= l.{time_col}
 AND r.{time_col} <= l.{time_col} + {tol_s}
"""
