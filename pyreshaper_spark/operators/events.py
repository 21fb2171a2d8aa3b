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


def events_rfm(events: DataFrame) -> DataFrame:
    """Per-user RFM activity card: Recency (last event epoch second),
    Frequency (events, active days, distinct types), Monetary (exact
    integer cents) — the segmentation input of every growth/analytics
    stack, here the per-entity activity profile of an event stream.

    Exactness: epoch seconds for recency, integer cents for money
    (the module's double-quantization contract), counts for the rest.

    Scale: ONE partial+final hash aggregate keyed user_id — no window,
    no join; output O(|users|).
    """
    ep = F.unix_timestamp("ts")
    return (
        events.select(
            "user_id",
            ep.alias("event_s"),
            floor_to(ep, 86400).alias("day_s"),
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min("event_s").cast("long").alias("first_s"),
            F.max("event_s").cast("long").alias("last_s"),
            F.count_distinct("day_s").cast("long").alias("active_days"),
            F.count_distinct("event_type").cast("long").alias("n_types"),
            F.sum("cents").cast("long").alias("sum_cents"),
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("cents"))
                .otherwise(F.lit(0))
            ).cast("long").alias("purchase_cents"),
        )
    )


def events_rfm_sql() -> str:
    """DuckDB twin of :func:`events_rfm`."""
    ep = "CAST(floor(epoch(ts)) AS BIGINT)"
    return f"""
SELECT user_id,
       CAST(count(*) AS BIGINT)                    AS n_events,
       CAST(min({ep}) AS BIGINT)                   AS first_s,
       CAST(max({ep}) AS BIGINT)                   AS last_s,
       CAST(count(DISTINCT {floor_sql(ep, 86400)}) AS BIGINT)
         AS active_days,
       CAST(count(DISTINCT event_type) AS BIGINT)  AS n_types,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents,
       CAST(sum(CASE WHEN event_type = 'purchase'
                THEN CAST(round(value * 100) AS BIGINT)
                ELSE 0 END) AS BIGINT)             AS purchase_cents
FROM events
GROUP BY 1
"""
