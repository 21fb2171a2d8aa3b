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

from pyreshaper_spark.functions.xhash import h32, h32_sql
from pyreshaper_spark.operators.rollup import floor_sql

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
            # floor-align then exact div (a floored multiple divides
            # exactly, so `div` truncation is safe for pre-epoch us
            # too; bare `us DIV day` would round pre-epoch days UP)
            F.expr(
                f"(us - pmod(us, {US_PER_DAY})) div {US_PER_DAY}"
            ).alias("day"),
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
  SELECT DISTINCT user_id,
         {floor_sql("epoch_us(ts)", US_PER_DAY)} // {US_PER_DAY} AS day
  FROM events
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
        F.expr(
            f"(us - pmod(us, {width_s * US_PER_S})) div {US_PER_S}"
        ).alias("bucket_s"),
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
SELECT {floor_sql("epoch_us(ts)", width_s * US_PER_S)} // {US_PER_S}
         AS bucket_s,
       {cols}
FROM events
GROUP BY 1
"""


def ab_test(
    events: DataFrame,
    goal_types: Sequence[str],
    z_num: int = 196,
    z_den: int = 100,
) -> DataFrame:
    """Exact two-proportion A/B test over the event stream — the
    experiment readout of product analytics. Users are assigned to
    variants A/B by the same deterministic md5-hash split as
    ``sampling.split_assign`` (assignment never changes as data
    grows); a user CONVERTS on a goal if they emitted that event type
    at least once. Per goal: exposed counts (n_a, n_b), conversions
    (c_a, c_b), and a ``significant`` flag testing |z| ≥ z_num/z_den
    (default 1.96, the 95% two-sided bound) with the z-test cleared of
    all division/sqrt:

        z² = (c_a·n_b − c_b·n_a)² · N / (n_a·n_b·C·(N−C))
        significant ⇔ (c_a·n_b − c_b·n_a)²·N·z_den²
                       ≥ z_num²·C·(N−C)·n_a·n_b

    computed in decimal(38,0) (DuckDB HUGEINT) — exact booleans, hence
    oracle-hashable where float z-scores are not. Inputs are cast from
    decimal(18,0), so exactness holds to ~3e8 users per variant; a
    planet-scale experiment switches to the float finisher, the flag
    math is unchanged.

    Shape: one distinct-user collapse (partial+final agg over
    (user, converted-goal set)), one hash agg to counts per variant —
    never a per-event shuffle; the goal list is a tiny constant.
    Degenerate edges (C = 0 or C = N: pooled variance 0) are
    not-significant by construction (both sides 0 → ≥ holds only if
    the difference is also 0 — we AND in C>0 and C<N explicitly).
    """
    variant = F.when(
        F.pmod(h32(F.col("user_id").cast("string")), F.lit(2)) == 0, "A"
    ).otherwise("B")
    per_user = (
        events.select(F.col("user_id"), "event_type")
        .groupBy("user_id")
        .agg(
            *[
                F.max(
                    F.when(F.col("event_type") == g, 1).otherwise(0)
                ).alias(f"g_{i}")
                for i, g in enumerate(goal_types)
            ]
        )
        .withColumn("variant", variant)
    )
    counts = per_user.groupBy("variant").agg(
        F.count("*").alias("n"),
        *[F.sum(f"g_{i}").alias(f"c_{i}") for i in range(len(goal_types))],
    )
    a = counts.filter(F.col("variant") == "A").alias("a")
    b = counts.filter(F.col("variant") == "B").alias("b")
    pair = a.crossJoin(b)  # 1 × 1 rows
    d18, d38 = "decimal(18,0)", "decimal(38,0)"
    rows = []
    for i, g in enumerate(goal_types):
        na, nb = F.col("a.n").cast(d18), F.col("b.n").cast(d18)
        ca, cb = F.col(f"a.c_{i}").cast(d18), F.col(f"b.c_{i}").cast(d18)
        # every operand widened to decimal(38,0) before multiplying:
        # Spark caps product PRECISION at 38, so values stay exact
        # while they fit 38 digits (~1e7 users/variant for this chain;
        # DuckDB HUGEINT has the same 128-bit envelope)
        big = (ca * nb - cb * na).cast(d38)
        n_tot = (na + nb).cast(d38)
        c_tot = (ca + cb).cast(d38)
        lhs = big * big * n_tot * F.lit(z_den * z_den).cast(d38)
        rhs = (
            F.lit(z_num * z_num).cast(d38)
            * c_tot
            * (n_tot - c_tot).cast(d38)
            * na.cast(d38)
            * nb.cast(d38)
        )
        rows.append(
            pair.select(
                F.lit(g).alias("goal"),
                F.col("a.n").cast("long").alias("n_a"),
                F.col("b.n").cast("long").alias("n_b"),
                F.col(f"a.c_{i}").cast("long").alias("c_a"),
                F.col(f"b.c_{i}").cast("long").alias("c_b"),
                (
                    (c_tot > 0) & (c_tot < n_tot) & (lhs >= rhs)
                ).alias("significant"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def ab_test_sql(
    goal_types: Sequence[str], z_num: int = 196, z_den: int = 100
) -> str:
    """DuckDB twin of :func:`ab_test` over the `events` view."""
    goals = ", ".join(f"'{g}'" for g in goal_types)
    return f"""
WITH per_user AS (
  SELECT user_id,
         CASE WHEN ({h32_sql('CAST(user_id AS VARCHAR)')}) % 2 = 0
              THEN 'A' ELSE 'B' END AS variant,
         g.goal,
         max(CASE WHEN event_type = g.goal THEN 1 ELSE 0 END) AS conv
  FROM events CROSS JOIN (SELECT unnest([{goals}]) AS goal) g
  GROUP BY 1, 2, 3
),
counts AS (
  SELECT goal, variant, count(*) AS n, sum(conv) AS c
  FROM per_user GROUP BY 1, 2
),
pair AS (
  SELECT a.goal,
         a.n AS n_a, b.n AS n_b,
         CAST(a.c AS BIGINT) AS c_a, CAST(b.c AS BIGINT) AS c_b
  FROM counts a JOIN counts b ON a.goal = b.goal
  WHERE a.variant = 'A' AND b.variant = 'B'
)
SELECT goal, n_a, n_b, c_a, c_b,
       (c_a + c_b > 0 AND c_a + c_b < n_a + n_b
        AND (CAST(c_a AS HUGEINT)*n_b - CAST(c_b AS HUGEINT)*n_a)
          * (CAST(c_a AS HUGEINT)*n_b - CAST(c_b AS HUGEINT)*n_a)
          * (n_a + n_b) * {z_den * z_den}
            >= CAST({z_num * z_num} AS HUGEINT)
               * (c_a + c_b) * ((n_a + n_b) - (c_a + c_b))
               * n_a * n_b) AS significant
FROM pair
"""
