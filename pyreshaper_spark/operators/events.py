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


def _user_days(events: DataFrame) -> DataFrame:
    """The DISTINCT (user_id, day_s) active set — the shared first
    stage of every engagement surface (DAU/WAU, engagement histogram):
    one partial agg collapses raw events to active-user-days."""
    ep = F.unix_timestamp("ts")
    return events.select(
        "user_id", floor_to(ep, 86400).alias("day_s")
    ).distinct()


def _user_days_cte() -> str:
    """DuckDB twin of :func:`_user_days` (a ``ud`` CTE body)."""
    ep = "CAST(floor(epoch(ts)) AS BIGINT)"
    day = floor_sql(ep, 86400)
    return f"SELECT DISTINCT user_id, {day} AS day_s FROM events"


def events_dau_wau(events: DataFrame) -> DataFrame:
    """DAU/WAU engagement curve: per day, distinct active users that
    day and over the trailing 7-day window — the stickiness panel
    (DAU/WAU ratio) of every product dashboard, here exact (no HLL).

    WAU is calendar-true via a constant 7-way map-side fan-out (each
    active (user, day) pair reports into the 7 report-days whose
    trailing window contains it) followed by one count-distinct — the
    :func:`~pyreshaper_spark.operators.rollup.hopping_rollup` shape at
    user granularity. Head days (fewer than 7 days of history) still
    report over the days that exist.

    Scale: the fan-out operates on the DISTINCT (user, day) set (one
    partial agg collapses raw events first), so work is bounded by
    active-user-days × 7, not by event volume.
    """
    ud = _user_days(events)
    dau = ud.groupBy("day_s").agg(
        F.count("*").cast("long").alias("dau")
    )
    wau = (
        ud.select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("j"),
            "day_s",
        )
        .select(
            "user_id", (F.col("day_s") + F.col("j") * 86400).alias("day_s")
        )
        .join(dau.select("day_s"), "day_s", "left_semi")
        .groupBy("day_s")
        .agg(F.count_distinct("user_id").cast("long").alias("wau"))
    )
    return (
        dau.join(wau, "day_s")
        .select(
            F.col("day_s").cast("long").alias("day_s"),
            "dau",
            "wau",
            F.expr("dau * 1000000 div wau").cast("long").alias("stick_ppm"),
        )
    )


def events_dau_wau_sql() -> str:
    """DuckDB twin of :func:`events_dau_wau`."""
    return f"""
WITH ud AS (
  {_user_days_cte()}
),
dau AS (
  SELECT day_s, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY 1
),
wau AS (
  SELECT f.day_s,
         CAST(count(DISTINCT f.user_id) AS BIGINT) AS wau
  FROM (
    SELECT user_id, day_s + j * 86400 AS day_s
    FROM ud CROSS JOIN generate_series(0, 6) AS g(j)
  ) f
  SEMI JOIN dau d ON d.day_s = f.day_s
  GROUP BY 1
)
SELECT CAST(dau.day_s AS BIGINT) AS day_s, dau.dau, wau.wau,
       CAST(dau.dau * 1000000 // wau.wau AS BIGINT) AS stick_ppm
FROM dau JOIN wau ON dau.day_s = wau.day_s
"""


def events_conversion_lag(
    events: DataFrame,
    from_type: str = "signup",
    to_type: str = "purchase",
) -> DataFrame:
    """Funnel latency: per converting user, the exact lag (seconds)
    from their FIRST ``from_type`` event to the first ``to_type``
    event AT OR AFTER it — the time-to-convert distribution behind
    every activation dashboard (the funnel op counts conversions; this
    measures how long they took).

    Two bounded aggregates (per-user first signup; per-user first
    qualifying purchase via a user-keyed equi-join that AQE broadcasts
    when the converting set is small) — output O(converting users).
    Non-converting users are absent by construction (inner join).
    """
    ep = F.unix_timestamp("ts")
    first_from = (
        events.filter(F.col("event_type") == from_type)
        .select("user_id", ep.alias("from_s"))
        .groupBy("user_id")
        .agg(F.min("from_s").alias("from_s"))
    )
    lag = (
        events.filter(F.col("event_type") == to_type)
        .select("user_id", ep.alias("to_s"))
        .join(first_from, "user_id")
        .filter(F.col("to_s") >= F.col("from_s"))
        .groupBy("user_id")
        .agg(
            F.min("from_s").cast("long").alias("from_s"),
            F.min("to_s").cast("long").alias("to_s"),
        )
    )
    return lag.select(
        "user_id",
        "from_s",
        "to_s",
        (F.col("to_s") - F.col("from_s")).cast("long").alias("lag_s"),
    )


def events_conversion_lag_sql(
    from_type: str = "signup", to_type: str = "purchase"
) -> str:
    """DuckDB twin of :func:`events_conversion_lag`."""
    ep = "CAST(floor(epoch(ts)) AS BIGINT)"
    return f"""
WITH ff AS (
  SELECT user_id, CAST(min({ep}) AS BIGINT) AS from_s
  FROM events WHERE event_type = '{from_type}' GROUP BY 1
)
SELECT e.user_id,
       CAST(min(ff.from_s) AS BIGINT)            AS from_s,
       CAST(min({ep}) AS BIGINT)                 AS to_s,
       CAST(min({ep}) - min(ff.from_s) AS BIGINT) AS lag_s
FROM events e
JOIN ff ON ff.user_id = e.user_id
WHERE e.event_type = '{to_type}' AND {ep} >= ff.from_s
GROUP BY 1
"""
def events_engagement_hist(events: DataFrame) -> DataFrame:
    """Power-user curve: the histogram of active-days-per-user — how
    many users were active exactly n distinct days (the L28-style
    engagement-depth readout, here over the full range).

    Two hash aggs over the DISTINCT (user, day) set; output bounded
    by the day count. Output: (n_days, n_users).
    """
    return (
        _user_days(events).groupBy("user_id")
        .agg(F.count("*").cast("long").alias("n_days"))
        .groupBy("n_days")
        .agg(F.count("*").cast("long").alias("n_users"))
    )


def events_engagement_hist_sql() -> str:
    """DuckDB twin of :func:`events_engagement_hist`."""
    return f"""
WITH ud AS ({_user_days_cte()}),
per_user AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_days FROM ud GROUP BY 1
)
SELECT n_days, CAST(count(*) AS BIGINT) AS n_users
FROM per_user GROUP BY 1
"""


def events_transitions(events: DataFrame) -> DataFrame:
    """Event-type transition counts — the empirical Markov matrix of
    user journeys: per user ordered by (epoch second, event_id), count
    each (previous type → type) step. First events per user have no
    predecessor and contribute nothing.

    One lag window on a single user-keyed sort + one hash agg — the
    sessionize plan shape. Output: (from_type, to_type, n_steps).
    """
    ep = F.unix_timestamp("ts").alias("ep")
    w = Window.partitionBy("user_id").orderBy("ep", "event_id")
    steps = (
        events.select("user_id", "event_id", "event_type", ep)
        .withColumn("from_type", F.lag("event_type").over(w))
        .filter(F.col("from_type").isNotNull())
    )
    return steps.groupBy("from_type", F.col("event_type").alias("to_type")).agg(
        F.count("*").cast("long").alias("n_steps")
    )


def events_transitions_sql() -> str:
    """DuckDB twin of :func:`events_transitions`."""
    return """
WITH e AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS ep
  FROM events
),
steps AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ep, event_id) AS from_type,
         event_type AS to_type
  FROM e
)
SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_steps
FROM steps WHERE from_type IS NOT NULL
GROUP BY 1, 2
"""


def events_paths3(events: DataFrame) -> DataFrame:
    """Frequent 3-step journey paths — the path-mining view one level
    up from :func:`events_transitions`' Markov matrix: count every
    (type → type → type) trigram of consecutive events per user, over
    the same deterministic (epoch second, event_id) total order.

    Same plan shape as transitions: ONE user-keyed sort carrying two
    lags + one hash agg; output is bounded by |event_types|³ regardless
    of corpus size. Users with fewer than 3 events contribute nothing.
    """
    ep = F.unix_timestamp("ts").alias("ep")
    w = Window.partitionBy("user_id").orderBy("ep", "event_id")
    steps = (
        events.select("user_id", "event_id", "event_type", ep)
        .withColumn("t1", F.lag("event_type", 2).over(w))
        .withColumn("t2", F.lag("event_type", 1).over(w))
        .filter(F.col("t1").isNotNull() & F.col("t2").isNotNull())
    )
    return steps.groupBy(
        "t1", "t2", F.col("event_type").alias("t3")
    ).agg(F.count("*").cast("long").alias("n_paths"))


def events_paths3_sql() -> str:
    """DuckDB twin of :func:`events_paths3`."""
    return """
WITH e AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS ep
  FROM events
),
steps AS (
  SELECT lag(event_type, 2) OVER (PARTITION BY user_id
                                  ORDER BY ep, event_id) AS t1,
         lag(event_type, 1) OVER (PARTITION BY user_id
                                  ORDER BY ep, event_id) AS t2,
         event_type AS t3
  FROM e
)
SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n_paths
FROM steps WHERE t1 IS NOT NULL AND t2 IS NOT NULL
GROUP BY 1, 2, 3
"""


def events_attribution(
    events: DataFrame, convert_type: str = "purchase"
) -> DataFrame:
    """First-touch / last-touch conversion ATTRIBUTION: for each
    user's FIRST ``convert_type`` event, credit (a) the user's
    earliest preceding non-conversion event (first touch — what
    acquired them) and (b) the latest one at or before the conversion
    (last touch — what closed them), then aggregate credits per
    event_type — the two classic single-touch attribution models of
    marketing analytics (the funnel counts conversions; this answers
    WHICH event type gets the credit).

    Deterministic total order: events tie-break by event_id, so
    same-second touches attribute identically across engines.

    Output (event_type, first_touch, last_touch), one row per event
    type that earned any credit.

    Scale shape: one bounded per-user min-aggregate (conversions), a
    user-keyed equi-join (AQE broadcasts when the converting set is
    small), and BOTH attribution picks ride one user-keyed exchange
    (two window orders over the same partitioning); the final credit
    aggregate is O(event types).
    """
    ep = F.unix_timestamp("ts").cast("long")
    conv = (
        events.filter(F.col("event_type") == convert_type)
        .select("user_id", ep.alias("p_s"))
        .groupBy("user_id")
        .agg(F.min("p_s").alias("p_s"))
    )
    touches = (
        events.filter(F.col("event_type") != convert_type)
        .select("user_id", ep.alias("e_s"), "event_type", "event_id")
        .join(conv, "user_id")
        .filter(F.col("e_s") <= F.col("p_s"))
    )
    w_first = Window.partitionBy("user_id").orderBy(
        F.col("e_s").asc(), F.col("event_id").asc()
    )
    w_last = Window.partitionBy("user_id").orderBy(
        F.col("e_s").desc(), F.col("event_id").desc()
    )
    picked = touches.withColumn(
        "rf", F.row_number().over(w_first)
    ).withColumn("rl", F.row_number().over(w_last))
    return (
        picked.groupBy("event_type")
        .agg(
            F.sum((F.col("rf") == 1).cast("long")).alias("first_touch"),
            F.sum((F.col("rl") == 1).cast("long")).alias("last_touch"),
        )
        .filter((F.col("first_touch") > 0) | (F.col("last_touch") > 0))
    )


def events_attribution_sql(convert_type: str = "purchase") -> str:
    """DuckDB twin of :func:`events_attribution`."""
    ep = "CAST(floor(epoch(ts)) AS BIGINT)"
    return f"""
WITH conv AS (
  SELECT user_id, min({ep}) AS p_s
  FROM events WHERE event_type = '{convert_type}'
  GROUP BY 1
),
touches AS (
  SELECT e.user_id, {ep} AS e_s, e.event_type, e.event_id
  FROM events e JOIN conv USING (user_id)
  WHERE e.event_type <> '{convert_type}' AND {ep} <= conv.p_s
),
picked AS (
  SELECT event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY e_s ASC, event_id ASC)  AS rf,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY e_s DESC, event_id DESC) AS rl
  FROM touches
)
SELECT event_type,
       CAST(sum(CASE WHEN rf = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS first_touch,
       CAST(sum(CASE WHEN rl = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS last_touch
FROM picked
GROUP BY 1
HAVING first_touch > 0 OR last_touch > 0
"""
