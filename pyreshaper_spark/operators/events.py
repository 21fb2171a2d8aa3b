"""Event-stream operators over the ``events`` table
(event_id, ts, user_id, event_type, value, props-json).

Rounds out the engine's query surface on the provided stream-shaped
table: typed time-bucket rollup, gap-based sessionization, and JSON
property extraction — all built-ins, all oracle-exact (doubles are
quantized to integer cents before aggregation; timestamps compared as
epoch seconds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyreshaper_spark.operators.rollup import floor_sql, floor_to

SESSION_GAP_S = 1800


def events_rollup(events: DataFrame, width_s: int = 300) -> DataFrame:
    """Per (event_type, bucket): count + exact integer cents sum."""
    ep = F.unix_timestamp("ts")
    return (
        events.select(
            "event_type",
            floor_to(ep, width_s).alias("bucket_s"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "bucket_s")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("cents").alias("sum_cents"),
        )
    )


def events_rollup_sql(width_s: int = 300) -> str:
    return f"""
SELECT event_type,
       {floor_sql("CAST(floor(epoch(ts)) AS BIGINT)", width_s)} AS bucket_s,
       count(*)                                   AS cnt,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events
GROUP BY 1, 2
"""


def sessionize(events: DataFrame, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """Gap-based sessionization: a >gap_s silence starts a new session
    per user. Two windows over one (user, ts) shuffle; output one row
    per session with exact integer bounds."""
    ep = F.unix_timestamp("ts").alias("ep")
    w = Window.partitionBy("user_id").orderBy("ep", "event_id")
    marked = (
        events.select("user_id", "event_id", ep)
        .withColumn("prev_ep", F.lag("ep").over(w))
        .withColumn(
            "new_sess",
            (
                F.col("prev_ep").isNull()
                | (F.col("ep") - F.col("prev_ep") > gap_s)
            ).cast("int"),
        )
        .withColumn(
            "session_idx",
            F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return marked.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ep").alias("first_ep"),
        F.max("ep").alias("last_ep"),
    )


def sessionize_sql(gap_s: int = SESSION_GAP_S) -> str:
    return f"""
WITH e AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep FROM events
),
marked AS (
  SELECT *,
    CASE WHEN lag(ep) OVER w IS NULL
              OR ep - lag(ep) OVER w > {gap_s} THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ep, event_id)
),
sess AS (
  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ep, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
  FROM marked
)
SELECT user_id, session_idx, count(*) AS n_events,
       min(ep) AS first_ep, max(ep) AS last_ep
FROM sess GROUP BY 1, 2
"""


def extract_props(events: DataFrame) -> DataFrame:
    """JSON property extraction: props -> k (int), per event."""
    return events.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


EXTRACT_PROPS_SQL = """
SELECT event_id, event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
"""


def session_coverage(
    events: DataFrame, width_s: int = 3600, gap_s: int = SESSION_GAP_S
) -> DataFrame:
    """Active session-seconds per time bucket (the uptime / concurrency
    panel): each session's ``[first_ep, last_ep]`` interval is clipped
    to every bucket it overlaps, clipped lengths summed per bucket.

    Gap-based sessions are non-overlapping WITHIN a user, so the
    per-user interval union is just the sum of clipped lengths — no
    sweep-line needed; across users the sum is total session-seconds
    (average concurrency = covered_s / width_s). Single-event sessions
    have zero length but still count in ``n_sessions``.

    Scale shape: sessionization's one (user, ts) shuffle, then each
    session explodes to ONLY the buckets it overlaps (fan-out = session
    span / width, bounded by gap-based construction) into one
    partial+final hash agg keyed by bucket — no join at all.

    Output: ``(bucket_s, covered_s, n_sessions)``.
    """
    sess = sessionize(events, gap_s)
    b = F.explode(
        F.sequence(
            floor_to(F.col("first_ep"), width_s),
            floor_to(F.col("last_ep"), width_s),
            F.lit(width_s),
        )
    ).alias("bucket_s")
    clipped = sess.select(b, "first_ep", "last_ep").select(
        "bucket_s",
        (
            F.least(F.col("last_ep"), F.col("bucket_s") + width_s)
            - F.greatest(F.col("first_ep"), F.col("bucket_s"))
        ).alias("cov"),
    )
    return clipped.groupBy("bucket_s").agg(
        F.sum("cov").cast("long").alias("covered_s"),
        F.count("*").cast("long").alias("n_sessions"),
    )


def session_coverage_sql(
    width_s: int = 3600, gap_s: int = SESSION_GAP_S
) -> str:
    """DuckDB twin of :func:`session_coverage`."""
    return f"""
SELECT bucket_s,
       CAST(sum(least(last_ep, bucket_s + {width_s})
                - greatest(first_ep, bucket_s)) AS BIGINT) AS covered_s,
       CAST(count(*) AS BIGINT)                            AS n_sessions
FROM (
  SELECT unnest(generate_series(
           {floor_sql('first_ep', width_s)},
           {floor_sql('last_ep', width_s)},
           {width_s})) AS bucket_s,
         first_ep, last_ep
  FROM ({sessionize_sql(gap_s)})
)
GROUP BY 1
"""
