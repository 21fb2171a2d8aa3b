"""Time-period similarity search over rollup tiers.

``day_profile_knn`` answers "which other days did this source behave
like?" — the period-similarity query every capacity planner and
anomaly triager runs (TimescaleDB users hand-roll it with
``time_bucket`` self-joins; Matrix-Profile literature calls the dense
version an all-pairs similarity join). The profile of a (source, day)
is its within-day vector of tier values (one slot per tier bucket,
missing slots ≡ 0), and similarity is exact squared Euclidean
distance, so both engines agree bit-for-bit.

Scale: the input is a TIER (O(sources × buckets)), never raw rows.
The pair stage is a per-(source, slot) equi-join, so candidate work is
Σ_slot days² per source — days is calendar-bounded (10 years ≈ 3.6 k),
a bounded self-join, not a corpus-sized one. For very long calendars,
pre-filter the tier to a trailing window before calling (the operator
composes with any tier filter; pushdown reaches the tier scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .rollup import floor_sql, floor_to

DEC38 = "decimal(38,0)"


def day_profile_knn(
    tier: DataFrame,
    k: int = 3,
    day_s: int = 86400,
    value_col: str = "sum_n_tok",
) -> DataFrame:
    """k nearest days per (source, day) by exact squared Euclidean
    distance between within-day tier-value profiles.

    Missing slots count as 0 on both sides, so
    ``d² = ‖a‖² + ‖b‖² − 2·Σ_shared a·b`` needs the cross term only
    over slots PRESENT IN BOTH days — one equi-join on (source, slot).
    Day pairs sharing no slot still rank (their dot is 0), because the
    pair universe is the per-source day × day join, not the dot join.

    Everything stays decimal(38,0): v ≤ int64 ⇒ v² ≤ ~1.7e38 would
    overflow, but tier sums are ≤ Σn_tok per bucket — the practical
    domain (≤ ~2^62 per day) keeps ‖·‖² within decimal(38,0); Spark
    raises on decimal overflow (ANSI), it never wraps.

    Ties break by neighbour day ascending, so ranks are
    engine-portable. Output: one row per (source, day, rank ≤ k).
    """
    v = F.col(value_col).cast(DEC38)
    slots = tier.select(
        "source",
        floor_to(F.col("bucket_s"), day_s).alias("day_s"),
        (F.col("bucket_s") - floor_to(F.col("bucket_s"), day_s)).alias(
            "slot"
        ),
        v.alias("v"),
    )
    days = slots.groupBy("source", "day_s").agg(
        F.sum(F.col("v") * F.col("v")).cast(DEC38).alias("norm2")
    )
    dots = (
        slots.alias("a")
        .join(
            slots.alias("b"),
            on=[
                F.col("a.source") == F.col("b.source"),
                F.col("a.slot") == F.col("b.slot"),
                F.col("a.day_s") != F.col("b.day_s"),
            ],
        )
        .groupBy(
            F.col("a.source").alias("source"),
            F.col("a.day_s").alias("day_s"),
            F.col("b.day_s").alias("nbr_day_s"),
        )
        .agg(F.sum(F.col("a.v") * F.col("b.v")).cast(DEC38).alias("dot"))
    )
    pairs = (
        days.alias("da")
        .join(
            days.alias("db"),
            on=[
                F.col("da.source") == F.col("db.source"),
                F.col("da.day_s") != F.col("db.day_s"),
            ],
        )
        .select(
            F.col("da.source").alias("source"),
            F.col("da.day_s").alias("day_s"),
            F.col("db.day_s").alias("nbr_day_s"),
            F.col("da.norm2").alias("na"),
            F.col("db.norm2").alias("nb"),
        )
        .join(dots, on=["source", "day_s", "nbr_day_s"], how="left")
        .select(
            "source",
            "day_s",
            "nbr_day_s",
            (
                F.col("na")
                + F.col("nb")
                - F.lit(2).cast(DEC38)
                * F.coalesce(F.col("dot"), F.lit(0).cast(DEC38))
            ).cast(DEC38).alias("d2"),
        )
    )
    w = Window.partitionBy("source", "day_s").orderBy(
        F.col("d2").asc(), F.col("nbr_day_s").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "source",
            F.col("day_s").cast("long").alias("day_s"),
            F.col("nbr_day_s").cast("long").alias("nbr_day_s"),
            "d2",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def day_discords(
    tier: DataFrame,
    m: int = 3,
    day_s: int = 86400,
    value_col: str = "sum_n_tok",
) -> DataFrame:
    """Top-``m`` DISCORD days per source — the days whose NEAREST
    neighbouring day profile is farthest away (Keogh et al.'s time-
    series discord, the anomaly dual of the :func:`day_profile_knn`
    motif search: a motif has a close neighbour, a discord has none).

    Derived entirely from the k=1 kNN output: rank days per source by
    their nearest-neighbour d² DESCENDING (ties: earlier day first)
    and keep the top m. Exact decimal(38,0) distances, engine-portable
    ranks. Sources with a single profiled day have no neighbour and
    cannot rank — same contract as the kNN.

    Output: (source, day_s, nbr_day_s, d2, drank ≤ m).
    """
    nn = day_profile_knn(tier, k=1, day_s=day_s, value_col=value_col)
    w = Window.partitionBy("source").orderBy(
        F.col("d2").desc(), F.col("day_s").asc()
    )
    return (
        nn.withColumn("drank", F.row_number().over(w))
        .filter(F.col("drank") <= m)
        .select(
            "source", "day_s", "nbr_day_s", "d2",
            F.col("drank").cast("int").alias("drank"),
        )
    )


def day_discords_sql(
    relation: str,
    m: int = 3,
    day_s: int = 86400,
    value_col: str = "sum_n_tok",
) -> str:
    """DuckDB twin of :func:`day_discords` — composes the shared
    :func:`_knn_ctes` chain (k = 1) and ranks its ``knn`` CTE by d²
    descending."""
    return (
        _knn_ctes(relation, 1, day_s, value_col)
        + f"""
SELECT source, day_s, nbr_day_s, d2, CAST(drank AS INT) AS drank
FROM (
  SELECT source, day_s, nbr_day_s, d2,
         row_number() OVER (PARTITION BY source
                            ORDER BY d2 DESC, day_s ASC) AS drank
  FROM knn)
WHERE drank <= {m}
"""
    )


def day_profile_knn_sql(
    relation: str,
    k: int = 3,
    day_s: int = 86400,
    value_col: str = "sum_n_tok",
) -> str:
    """DuckDB twin of :func:`day_profile_knn` over a named tier
    relation. Emits CONTINUATION CTEs (leading comma) — append after
    an open ``WITH`` chain that already defines ``relation``."""
    return (
        _knn_ctes(relation, k, day_s, value_col)
        + "\nSELECT source, day_s, nbr_day_s, d2, rank FROM knn\n"
    )


def _knn_ctes(
    relation: str,
    k: int,
    day_s: int,
    value_col: str,
) -> str:
    """Shared CTE chain for the day-profile kNN family: continuation
    CTEs (leading comma) ending in a fully-typed ``knn`` CTE with one
    row per (source, day, rank ≤ k) — composed by both
    :func:`day_profile_knn_sql` and :func:`day_discords_sql`."""
    day = floor_sql("bucket_s", day_s)
    return f"""
, slots AS (
  SELECT source,
         {day}                            AS day_s,
         bucket_s - ({day})               AS slot,
         CAST({value_col} AS DECIMAL(38,0)) AS v
  FROM {relation}
),
days AS (
  SELECT source, day_s,
         CAST(sum(v * v) AS DECIMAL(38,0)) AS norm2
  FROM slots GROUP BY 1, 2
),
dots AS (
  SELECT a.source, a.day_s, b.day_s AS nbr_day_s,
         CAST(sum(a.v * b.v) AS DECIMAL(38,0)) AS dot
  FROM slots a JOIN slots b
    ON a.source = b.source AND a.slot = b.slot
   AND a.day_s <> b.day_s
  GROUP BY 1, 2, 3
),
pairs AS (
  SELECT da.source, da.day_s, db.day_s AS nbr_day_s,
         CAST(da.norm2 + db.norm2
              - 2 * coalesce(d.dot, 0) AS DECIMAL(38,0)) AS d2
  FROM days da
  JOIN days db ON da.source = db.source AND da.day_s <> db.day_s
  LEFT JOIN dots d
    ON d.source = da.source AND d.day_s = da.day_s
   AND d.nbr_day_s = db.day_s
),
knn AS (
  SELECT source,
         CAST(day_s AS BIGINT)     AS day_s,
         CAST(nbr_day_s AS BIGINT) AS nbr_day_s,
         d2,
         CAST(rank AS INT)         AS rank
  FROM (
    SELECT *, row_number() OVER (
             PARTITION BY source, day_s
             ORDER BY d2 ASC, nbr_day_s ASC) AS rank
    FROM pairs)
  WHERE rank <= {k}
)
"""
