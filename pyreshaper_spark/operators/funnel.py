"""Event funnel, cohort retention, and type pivot — the product-
analytics trio over the ``events`` stream table.

All exact-integer: timestamps become epoch MICROSECONDS
(``unix_micros`` ≡ DuckDB ``epoch_us`` — the fixture carries sub-second
precision, so seconds would collide), counts are longs, and the funnel
depth is derived from null-ness, so every output is oracle-hashable.

Scale shapes:

* :func:`funnel` — k steps = k filtered hash aggregates + k−1 equi-
  joins on ``user_id`` (each step's frame is one row per user —
  monotonically shrinking); no window over the raw stream, no
  per-user event sorting. The classic "min-after-min" formulation.
* :func:`cohort_retention` — distinct (user, day) collapses the stream
  first (partial agg); the cohort join is user-keyed; the matrix agg
  is O(cohorts × horizon).
* :func:`type_pivot` — a pivot over a FIXED type list (explicit values
  → no discovery pass, stable schema) is just a conditional hash agg.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

US_PER_S = 1_000_000
US_PER_DAY = 86_400 * US_PER_S


def _us() -> F.Column:
    # ts is TIMESTAMP_NTZ in the fixture; the cast to TIMESTAMP is
    # value-preserving under the mandatory UTC session timezone, and
    # unix_micros then matches DuckDB's epoch_us(ts) exactly
    return F.unix_micros(F.col("ts").cast("timestamp"))


def _ev(events: DataFrame) -> DataFrame:
    return events.select("user_id", _us().alias("us"), "event_type")


def funnel(
    events: DataFrame,
    steps: Sequence[str] = ("view", "click", "purchase"),
    within_s: int | None = None,
) -> DataFrame:
    """Per-user funnel progression: t_i = earliest step-i event AFTER
    the user's t_{i-1} (strict ordering — same-microsecond events do
    not chain), optionally all within ``within_s`` of t_1. Output one
    row per user who reached step 1: (user_id, t_1 … t_k micros with
    nulls past the drop-off, depth)."""
    ev = _ev(events)
    out = (
        ev.filter(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("us").alias("t_1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = ev.filter(F.col("event_type") == step).select("user_id", "us")
        j = out.join(nxt, "user_id").filter(
            F.col("us") > F.col(f"t_{i - 1}")
        )
        if within_s is not None:
            j = j.filter(
                F.col("us") <= F.col("t_1") + within_s * US_PER_S
            )
        stepped = j.groupBy("user_id").agg(F.min("us").alias(f"t_{i}"))
        out = out.join(stepped, "user_id", "left")
    depth = F.lit(1)
    for i in range(2, len(steps) + 1):
        depth = depth + F.when(F.col(f"t_{i}").isNotNull(), 1).otherwise(0)
    return out.withColumn("depth", depth.cast("long"))


def funnel_sql(
    steps: Sequence[str] = ("view", "click", "purchase"),
    within_s: int | None = None,
) -> str:
    """DuckDB twin of :func:`funnel` over the ``events`` view."""
    ctes = [
        "ev AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events)",
        f"""s1 AS (
  SELECT user_id, min(us) AS t_1 FROM ev
  WHERE event_type = '{steps[0]}' GROUP BY 1
)""",
    ]
    for i, step in enumerate(steps[1:], start=2):
        within = (
            f" AND us <= t_1 + {within_s * US_PER_S}"
            if within_s is not None
            else ""
        )
        prev_join = " ".join(
            f"JOIN s{j} USING (user_id)" for j in range(1, i)
        )
        ctes.append(
            f"""s{i} AS (
  SELECT ev.user_id, min(us) AS t_{i}
  FROM ev {prev_join}
  WHERE event_type = '{step}' AND us > t_{i - 1}{within}
  GROUP BY 1
)"""
        )
    t_cols = ", ".join(f"t_{i}" for i in range(1, len(steps) + 1))
    joins = " ".join(
        f"LEFT JOIN s{i} USING (user_id)" for i in range(2, len(steps) + 1)
    )
    depth = " + ".join(
        ["1"]
        + [
            f"(CASE WHEN t_{i} IS NOT NULL THEN 1 ELSE 0 END)"
            for i in range(2, len(steps) + 1)
        ]
    )
    return f"""
WITH {",".join(ctes)}
SELECT s1.user_id, {t_cols}, CAST({depth} AS BIGINT) AS depth
FROM s1 {joins}
"""


def cohort_retention(events: DataFrame) -> DataFrame:
    """Cohort retention matrix: users are cohorted by first-active day;
    (cohort_day, k_day) counts distinct cohort members active k days
    after their first day. Exact integers; input collapses to distinct
    (user, day) before anything else."""
    days = (
        _ev(events)
        .select(
            "user_id",
            F.expr(f"us DIV {US_PER_DAY}").alias("day"),
        )
        .distinct()
    )
    first = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(first, "user_id")
        .select(
            "user_id",
            "cohort_day",
            (F.col("day") - F.col("cohort_day")).alias("k_day"),
        )
        .groupBy("cohort_day", "k_day")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


def cohort_retention_sql() -> str:
    return f"""
WITH days AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {US_PER_DAY} AS day FROM events
),
first AS (SELECT user_id, min(day) AS cohort_day FROM days GROUP BY 1)
SELECT f.cohort_day, d.day - f.cohort_day AS k_day,
       count(DISTINCT d.user_id) AS n_users
FROM days d JOIN first f USING (user_id)
GROUP BY 1, 2
"""


def type_pivot(events: DataFrame, width_s: int = 3600) -> DataFrame:
    """Wide per-bucket event-type counts: one row per time bucket with
    a count column per type. The type list is FIXED (no discovery scan,
    stable schema — what a dashboard table wants); Spark compiles the
    pivot to a conditional hash aggregate."""
    ev = events.select(_us().alias("us"), "event_type").select(
        (F.expr(f"us DIV {width_s * US_PER_S}") * width_s).alias("bucket_s"),
        "event_type",
    )
    out = (
        ev.groupBy("bucket_s")
        .pivot("event_type", list(EVENT_TYPES))
        .count()
    )
    return out.select(
        "bucket_s",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in EVENT_TYPES
        ],
    )


def type_pivot_sql(width_s: int = 3600) -> str:
    cols = ",\n       ".join(
        f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS n_{t}"
        for t in EVENT_TYPES
    )
    return f"""
SELECT (epoch_us(ts) // {width_s * US_PER_S}) * {width_s} AS bucket_s,
       {cols}
FROM events
GROUP BY 1
"""
