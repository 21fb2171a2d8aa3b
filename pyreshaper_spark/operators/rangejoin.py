"""Interval (range) join — point-in-interval matching at scale.

Spark has no native range join: the naive
``points.join(intervals, point_ts BETWEEN start AND end)`` theta-join
plans as BroadcastNestedLoopJoin — O(P × I) compared rows, a
100 TB-killer. The scale-correct shape (same trick Databricks' range
join optimization and KDB/TimescaleDB bucketed joins use):

1. explode each interval into the COARSE time chunks it covers
   (``chunk_s`` wide — the explode factor is interval_len/chunk_s);
2. tag each point with its single chunk;
3. hash equi-join on (key, chunk) — shuffleable, broadcastable,
   AQE-skew-handleable like any equi-join;
4. apply the exact range predicate to the (small) candidate set.

A point lives in exactly one chunk, so every (point, interval) pair is
produced at most once — no post-join dedup. ``chunk_s`` trades the
interval fan-out against join selectivity; set it near the typical
interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_ts: str,
    start_col: str,
    end_col: str,
    chunk_s: int,
    end_exclusive: bool = False,
) -> DataFrame:
    """Join point rows onto interval rows where
    ``points[point_ts] ∈ [start_col, end_col]`` (integer epoch
    seconds; the end bound is inclusive by default —
    ``end_exclusive=True`` gives the half-open ``[start, end)`` shape
    that tier-bucket windows use) and the ``key`` columns match.

    Output: one row per matching (point, interval) pair carrying all
    columns of both inputs (interval columns win name clashes — rename
    upstream if both sides share non-key column names).
    """
    from pyreshaper_spark.operators.rollup import floor_to

    # int64-exact chunk grid (floor_to, never float `/` + truncate):
    # double division loses exactness past 2^53 and truncates toward
    # zero for pre-epoch timestamps — both sides must bucket on the
    # identical grid or boundary pairs silently drop. The chunk id is
    # the floored epoch itself (a multiple of chunk_s), so the explode
    # is a step-chunk_s sequence: pure integer arithmetic end to end.
    end_chunk = F.col(end_col) - 1 if end_exclusive else F.col(end_col)
    chunk_of = lambda c: floor_to(c.cast("long"), chunk_s)
    # Degenerate totality: a zero-width half-open interval (end==start
    # with end_exclusive) or a reversed interval (end < start) makes
    # floor(start) > floor(end_chunk), and the explicit positive step
    # would raise "Illegal sequence boundaries" at runtime. Clamp the
    # stop to at least the start chunk — the spurious single candidate
    # chunk is filtered out by the exact range predicate below, so
    # degenerate intervals still contribute zero pairs (the behavior
    # the old step-less sequence gave, without its descending-step
    # accident).
    iv = intervals.withColumn(
        "_chunk",
        F.explode(
            F.sequence(
                chunk_of(F.col(start_col)),
                F.greatest(chunk_of(end_chunk), chunk_of(F.col(start_col))),
                F.lit(chunk_s).cast("long"),
            )
        ),
    )
    pts = points.withColumn("_chunk", chunk_of(F.col(point_ts)))
    upper = (
        F.col(point_ts) < F.col(end_col)
        if end_exclusive
        else F.col(point_ts) <= F.col(end_col)
    )
    return (
        pts.join(iv, [key, "_chunk"])
        .filter((F.col(point_ts) >= F.col(start_col)) & upper)
        .drop("_chunk")
    )


def interval_join_sql(
    left_cte: str,
    windows_cte: str,
    left_cols: tuple[str, ...],
    time_col: str = "event_s",
    key: str = "source",
) -> str:
    """DuckDB twin for the half-open window shape — a direct range
    join (DuckDB's IEJoin handles the non-equi predicate natively; the
    chunk trick is Spark-side physics, not semantics)."""
    lcols = ", ".join(f"l.{c}" for c in left_cols)
    return f"""
SELECT {lcols},
       CAST(w.start_s AS BIGINT) AS start_s,
       CAST(w.end_s AS BIGINT)   AS end_s
FROM {left_cte} l
JOIN {windows_cte} w
  ON l.{key} = w.{key}
 AND l.{time_col} >= w.start_s
 AND l.{time_col} <  w.end_s
"""


def events_in_sessions(events: DataFrame, gap_s: int | None = None,
                       chunk_s: int = 1800) -> DataFrame:
    """Range-join demo + invariant: assign every event back to its
    session's [first_ep, last_ep] window via :func:`interval_join` and
    re-aggregate. Per session, the joined count/bounds must reproduce
    ``sessionize``'s — every event falls in exactly one session window
    of its user (windows are gap-separated, so they never overlap).
    Output (user_id, session_idx, n_joined, min_ep, max_ep) — integers.
    """
    from pyreshaper_spark.operators.events import SESSION_GAP_S, sessionize

    gap = SESSION_GAP_S if gap_s is None else gap_s
    sessions = sessionize(events, gap)
    pts = events.select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("ep")
    )
    joined = interval_join(
        pts, sessions, key="user_id", point_ts="ep",
        start_col="first_ep", end_col="last_ep", chunk_s=chunk_s,
    )
    return joined.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_joined"),
        F.min("ep").alias("min_ep"),
        F.max("ep").alias("max_ep"),
    )


def events_in_sessions_sql(gap_s: int | None = None) -> str:
    """DuckDB twin: sessions CTE (same math as sessionize_sql) + a
    plain range join + re-aggregation."""
    from pyreshaper_spark.operators.events import SESSION_GAP_S

    gap = SESSION_GAP_S if gap_s is None else gap_s
    return f"""
WITH ev AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep FROM events
),
marked AS (
  SELECT user_id, event_id, ep,
         CASE WHEN lag(ep) OVER w IS NULL
                OR ep - lag(ep) OVER w > {gap} THEN 1 ELSE 0 END AS new_sess
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ep, event_id)
),
sess_events AS (
  SELECT user_id, event_id, ep,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ep, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_idx
  FROM marked
),
sessions AS (
  SELECT user_id, session_idx,
         min(ep) AS first_ep, max(ep) AS last_ep
  FROM sess_events GROUP BY 1, 2
)
SELECT s.user_id, s.session_idx,
       count(*)        AS n_joined,
       min(e.ep)       AS min_ep,
       max(e.ep)       AS max_ep
FROM sessions s
JOIN ev e ON e.user_id = s.user_id
         AND e.ep BETWEEN s.first_ep AND s.last_ep
GROUP BY 1, 2
"""
