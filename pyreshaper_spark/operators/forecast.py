"""Forecast backtest over tier series: naive and seasonal-naive
baselines with exact-integer error accounting.

The two standard zero-parameter forecasters (Hyndman & Athanasopoulos,
*Forecasting: Principles and Practice* §5.2 — the benchmarks every
"real" model must beat, and the denominators of MASE):

* **naive**: forecast for a bucket = the source's PREVIOUS OBSERVED
  bucket's value (a row lag within the source's bucket-time order —
  deliberately gap-skipping, "last value seen");
* **seasonal naive**: forecast = the value exactly one season earlier
  (a bucket-KEYED self-join like :func:`gapfill.seasonal_diff`, NOT a
  row lag — a gap must leave the forecast NULL, not shift the
  comparison point).

Everything stays in exact integers: per-bucket errors are integer
differences; the accuracy rollup returns raw ``(Σ|e|, n)`` pairs per
method (restricted to buckets where BOTH methods produced a forecast,
so the comparison is apples-to-apples) plus ``Σ|actual|`` — consumers
divide at presentation time (MAE = Σ|e|/n, MASE = Σ|e_m|/Σ|e_naive|),
the engine never emits a float.

Scale shape: the input is an already-aggregated tier (O(buckets)
rows). One source-keyed sort window (the same per-source sort every
tier analytic pays) + one equi-join on the tier's own (source,
bucket_s) keys — co-partitioned with the tier's layout; the accuracy
rollup is one partial+final hash agg keyed by source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snaive_backtest(
    tier: DataFrame, season_s: int, value_col: str = "sum_n_tok"
) -> DataFrame:
    """Per (source, bucket): actual value, naive forecast, seasonal-
    naive forecast, and their absolute errors (NULL where the needed
    history is missing).

    Output: ``(source, bucket_s, actual, fc_naive, err_naive,
    fc_snaive, err_snaive)``.
    """
    v = F.col(value_col)
    cur = tier.select(
        "source",
        F.col("bucket_s").cast("long").alias("bucket_s"),
        v.cast("long").alias("actual"),
    )
    w = Window.partitionBy("source").orderBy("bucket_s")
    cur = cur.withColumn("fc_naive", F.lag("actual").over(w))
    season = tier.select(
        "source",
        (F.col("bucket_s") + season_s).cast("long").alias("bucket_s"),
        v.cast("long").alias("fc_snaive"),
    )
    return cur.join(season, ["source", "bucket_s"], "left").select(
        "source",
        "bucket_s",
        "actual",
        "fc_naive",
        F.abs(F.col("actual") - F.col("fc_naive"))
        .cast("long")
        .alias("err_naive"),
        "fc_snaive",
        F.abs(F.col("actual") - F.col("fc_snaive"))
        .cast("long")
        .alias("err_snaive"),
    )


def snaive_backtest_sql(
    relation: str, season_s: int, value_col: str = "sum_n_tok"
) -> str:
    """DuckDB twin of :func:`snaive_backtest` over a named tier
    relation with columns ``(source, bucket_s, {value_col})``."""
    return f"""
SELECT c.source, c.bucket_s, c.actual,
       c.fc_naive,
       CAST(abs(c.actual - c.fc_naive) AS BIGINT)  AS err_naive,
       s.fc_snaive,
       CAST(abs(c.actual - s.fc_snaive) AS BIGINT) AS err_snaive
FROM (
  SELECT source,
         CAST(bucket_s AS BIGINT)    AS bucket_s,
         CAST({value_col} AS BIGINT) AS actual,
         lag(CAST({value_col} AS BIGINT)) OVER (
           PARTITION BY source ORDER BY CAST(bucket_s AS BIGINT)
         ) AS fc_naive
  FROM {relation}
) c
LEFT JOIN (
  SELECT source,
         CAST(bucket_s AS BIGINT) + {season_s} AS bucket_s,
         CAST({value_col} AS BIGINT)           AS fc_snaive
  FROM {relation}
) s ON c.source = s.source AND c.bucket_s = s.bucket_s
"""


def forecast_accuracy(
    tier: DataFrame, season_s: int, value_col: str = "sum_n_tok"
) -> DataFrame:
    """Per-source backtest scorecard over the buckets where BOTH
    baselines produced a forecast: exact integer error masses.

    Output: ``(source, n_eval, sae_naive, sae_snaive, sum_abs_actual)``
    — MAE_m = sae_m / n_eval, MASE_snaive = sae_snaive / sae_naive,
    WAPE_m = sae_m / sum_abs_actual, all left to the consumer so no
    float leaves the engine.
    """
    bt = snaive_backtest(tier, season_s, value_col).filter(
        F.col("err_naive").isNotNull() & F.col("err_snaive").isNotNull()
    )
    return bt.groupBy("source").agg(
        F.count("*").cast("long").alias("n_eval"),
        F.sum("err_naive").cast("long").alias("sae_naive"),
        F.sum("err_snaive").cast("long").alias("sae_snaive"),
        F.sum(F.abs(F.col("actual"))).cast("long").alias("sum_abs_actual"),
    )


def forecast_accuracy_sql(
    relation: str, season_s: int, value_col: str = "sum_n_tok"
) -> str:
    """DuckDB twin of :func:`forecast_accuracy`."""
    return f"""
SELECT source,
       CAST(count(*) AS BIGINT)         AS n_eval,
       CAST(sum(err_naive) AS BIGINT)   AS sae_naive,
       CAST(sum(err_snaive) AS BIGINT)  AS sae_snaive,
       CAST(sum(abs(actual)) AS BIGINT) AS sum_abs_actual
FROM ({snaive_backtest_sql(relation, season_s, value_col)})
WHERE err_naive IS NOT NULL AND err_snaive IS NOT NULL
GROUP BY 1
"""


def holt_backtest(
    tier: DataFrame, k: int = 6, value_col: str = "sum_n_tok"
) -> DataFrame:
    """Holt linear-trend one-step backtest with power-of-two weights —
    the level+trend forecaster that beats naive on trending series
    (Hyndman §8.2), kept EXACT the way :func:`gapfill.ewma_binary` is:
    truncated exponential weights 2^j, so level and trend are integer
    rationals with CONSTANT denominators and the forecast is

        fc = level + trend
           = (L_num·D_den + D_num·L_den) / (L_den·D_den)

    where, from data STRICTLY BEFORE the scored bucket (lags 1..k),

        L_num = Σ_{i=1..k} 2^(k−i)·v_{t−i}          L_den = 2^k − 1
        D_num = Σ_{j=1..k−1} 2^(k−1−j)·(v_{t−j} − v_{t−j−1})
        D_den = 2^(k−1) − 1

    Emitted only where the full k-lag history exists, so ``fc_den`` is
    the same constant on every row and the scaled absolute error
    ``err_scaled = |actual·fc_den − fc_num|`` aggregates into an
    apples-to-apples MAE (÷ fc_den at presentation). Positions are
    observation ranks (gap-skipping, like the naive baseline); run
    over a gap-filled tier for calendar semantics.

    One window, k explicit lags, single source-keyed shuffle — the
    ewma/rolling-slope plan.
    """
    if k < 2:
        raise ValueError(f"holt_backtest needs k >= 2, got {k}")
    w = Window.partitionBy("source").orderBy("bucket_s")
    v = F.col(value_col)
    lags = [v if i == 0 else F.lag(value_col, i).over(w) for i in range(k + 1)]
    l_num = F.lit(0).cast("long")
    for i in range(1, k + 1):
        l_num = l_num + lags[i] * F.lit(1 << (k - i))
    d_num = F.lit(0).cast("long")
    for j in range(1, k):
        d_num = d_num + (lags[j] - lags[j + 1]) * F.lit(1 << (k - 1 - j))
    l_den = (1 << k) - 1
    d_den = (1 << (k - 1)) - 1
    fc_num = l_num * F.lit(d_den) + d_num * F.lit(l_den)
    fc_den = l_den * d_den
    full = lags[k].isNotNull()
    actual = v.cast("long")
    return tier.select(
        "source",
        F.col("bucket_s").cast("long").alias("bucket_s"),
        actual.alias("actual"),
        F.when(full, fc_num).cast("long").alias("fc_num"),
        F.lit(fc_den).cast("long").alias("fc_den"),
        F.when(full, F.abs(actual * F.lit(fc_den) - fc_num))
        .cast("long")
        .alias("err_scaled"),
    )


def holt_backtest_sql(
    relation: str, k: int = 6, value_col: str = "sum_n_tok"
) -> str:
    """DuckDB twin of :func:`holt_backtest` over a named tier
    relation."""
    if k < 2:
        raise ValueError(f"holt_backtest_sql needs k >= 2, got {k}")

    def lag(i: int) -> str:
        return (
            f"lag({value_col}, {i}) OVER "
            f"(PARTITION BY source ORDER BY bucket_s)"
        )

    l_terms = " + ".join(
        f"({lag(i)}) * {1 << (k - i)}" for i in range(1, k + 1)
    )
    d_terms = " + ".join(
        f"(({lag(j)}) - ({lag(j + 1)})) * {1 << (k - 1 - j)}"
        for j in range(1, k)
    )
    l_den = (1 << k) - 1
    d_den = (1 << (k - 1)) - 1
    fc_den = l_den * d_den
    fc_num = f"(({l_terms}) * {d_den} + ({d_terms}) * {l_den})"
    full = f"({lag(k)}) IS NOT NULL"
    return f"""
SELECT source,
       CAST(bucket_s AS BIGINT)    AS bucket_s,
       CAST({value_col} AS BIGINT) AS actual,
       CAST(CASE WHEN {full} THEN {fc_num} END AS BIGINT) AS fc_num,
       CAST({fc_den} AS BIGINT) AS fc_den,
       CAST(CASE WHEN {full}
            THEN abs(CAST({value_col} AS BIGINT) * {fc_den} - {fc_num})
            END AS BIGINT) AS err_scaled
FROM {relation}
"""


def conformal_interval(
    tier: DataFrame,
    alpha_num: int = 1,
    alpha_den: int = 10,
    split_num: int = 4,
    split_den: int = 5,
    value_col: str = "sum_n_tok",
) -> DataFrame:
    """Split-conformal prediction intervals around the naive forecast
    — the distribution-free uncertainty band an alerting/forecasting
    consumer actually wants next to a point forecast (Vovk's conformal
    guarantee: ≥ 1−α marginal coverage under exchangeability, NO
    distributional assumption).

    Per source: the earliest ``split_num/split_den`` of buckets are
    the CALIBRATION window; q̂ = the ⌈(n_cal+1)(1−α)⌉-th smallest
    absolute naive-backtest residual there (an exact integer order
    statistic — never a float quantile; clamped to the largest
    residual when the rank exceeds n_cal, i.e. too little calibration
    data for the requested α). Every later bucket gets
    ``[fc − q̂, fc + q̂]`` and a coverage flag.

    Output: (source, bucket_s, actual, fc, qhat, lo, hi, covered) over
    the evaluation buckets. A source with NO usable calibration
    residual (under ~2 buckets of history) keeps its evaluation rows
    with NULL qhat/lo/hi/covered — visible to the consumer, never
    silently dropped.

    Scale shape: runs on the O(buckets) tier — the position/count and
    residual-rank windows share the per-source sort every tier
    analytic pays; q̂ is ONE row per source joined back broadcast.
    """
    if not (0 < alpha_num < alpha_den and 0 < split_num < split_den):
        raise ValueError("need 0 < alpha < 1 and 0 < split < 1")
    w = Window.partitionBy("source").orderBy("bucket_s")
    actual = F.col(value_col).cast("long")
    bt = tier.select(
        "source",
        F.col("bucket_s").cast("long").alias("bucket_s"),
        actual.alias("actual"),
    ).withColumn("fc_naive", F.lag("actual").over(w)).withColumn(
        "err_naive", F.abs(F.col("actual") - F.col("fc_naive"))
    )
    wall = Window.partitionBy("source")
    rows = bt.withColumn("pos", F.row_number().over(w)).withColumn(
        "n_all", F.count("*").over(wall)
    )
    split_pos = F.expr(f"n_all * {split_num} div {split_den}")
    cal = rows.filter(
        (F.col("pos") <= split_pos) & F.col("err_naive").isNotNull()
    )
    wr = Window.partitionBy("source").orderBy(
        F.col("err_naive").asc(), F.col("bucket_s").asc()
    )
    ranked = cal.select(
        "source", "err_naive", F.row_number().over(wr).alias("r")
    ).withColumn("n_cal", F.count("*").over(wall))
    r_target = F.expr(
        f"((n_cal + 1) * {alpha_den - alpha_num} + {alpha_den - 1}) "
        f"div {alpha_den}"
    )
    qhat = ranked.filter(
        F.col("r") == F.least(r_target, F.col("n_cal"))
    ).select("source", F.col("err_naive").alias("qhat"))
    ev = rows.filter(
        (F.col("pos") > split_pos) & F.col("fc_naive").isNotNull()
    )
    return ev.join(F.broadcast(qhat), "source", "left").select(
        "source",
        "bucket_s",
        "actual",
        F.col("fc_naive").alias("fc"),
        "qhat",
        (F.col("fc_naive") - F.col("qhat")).alias("lo"),
        (F.col("fc_naive") + F.col("qhat")).alias("hi"),
        (
            (F.col("actual") >= F.col("fc_naive") - F.col("qhat"))
            & (F.col("actual") <= F.col("fc_naive") + F.col("qhat"))
        ).alias("covered"),
    )


def conformal_interval_sql(
    relation: str,
    alpha_num: int = 1,
    alpha_den: int = 10,
    split_num: int = 4,
    split_den: int = 5,
    value_col: str = "sum_n_tok",
) -> str:
    """DuckDB twin of :func:`conformal_interval` over a named tier
    relation (CTE continuation — append after a WITH chain)."""
    width = alpha_den - alpha_num
    return f"""
cbt AS (
  SELECT source, CAST(bucket_s AS BIGINT) AS bucket_s,
         CAST({value_col} AS BIGINT) AS actual,
         lag(CAST({value_col} AS BIGINT)) OVER
           (PARTITION BY source ORDER BY bucket_s) AS fc_naive
  FROM {relation}
),
crows AS (
  SELECT *,
         abs(actual - fc_naive) AS err_naive,
         row_number() OVER (PARTITION BY source ORDER BY bucket_s)
           AS pos,
         count(*) OVER (PARTITION BY source) AS n_all
  FROM cbt
),
ccal AS (
  SELECT source, err_naive,
         row_number() OVER (PARTITION BY source
                            ORDER BY err_naive ASC, bucket_s ASC) AS r,
         count(*) OVER (PARTITION BY source) AS n_cal
  FROM crows
  WHERE pos <= n_all * {split_num} // {split_den}
    AND err_naive IS NOT NULL
),
cq AS (
  SELECT source, CAST(err_naive AS BIGINT) AS qhat
  FROM ccal
  WHERE r = least(((n_cal + 1) * {width} + {alpha_den - 1})
                  // {alpha_den}, n_cal)
)
SELECT e.source, e.bucket_s, e.actual,
       CAST(e.fc_naive AS BIGINT) AS fc, q.qhat,
       CAST(e.fc_naive - q.qhat AS BIGINT) AS lo,
       CAST(e.fc_naive + q.qhat AS BIGINT) AS hi,
       e.actual BETWEEN e.fc_naive - q.qhat AND e.fc_naive + q.qhat
         AS covered
FROM crows e LEFT JOIN cq q ON q.source = e.source
WHERE e.pos > e.n_all * {split_num} // {split_den}
  AND e.fc_naive IS NOT NULL
"""
