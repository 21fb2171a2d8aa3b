"""Cross-source co-movement: exact correlation moments over tier pairs.

Pearson correlation between two sources' rolled-up series is float
arithmetic — not oracle-hashable across engines — so the operator is
split: :func:`source_corr_moments` emits the EXACT integer sufficient
statistics (n, Σx, Σy, Σxy, Σx², Σy² per source pair, decimal(38,0) so
1e12-scale products cannot overflow int64), which the DuckDB oracle
reproduces bit-for-bit; :func:`corr_finish` derives the float r from
those moments driver-side (pytest-checked against numpy, not
oracle-hashed).

Scale notes: the join input is a TIER (O(sources × buckets) rows —
already reduced from raw), equi-keyed on bucket_s; per-bucket pair
fan-out is O(S²) for S sources sharing a bucket, which is the
dashboard regime (tens to hundreds of monitored sources). For very
wide S, pass ``sources=`` to restrict either side before the join —
the correlation matrix itself is inherently quadratic in S, so the
knob is selection, not a smarter join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Moment column names shared with the oracle SQL.
MOMENT_COLS = ("n_buckets", "sx", "sy", "sxy", "sxx", "syy")


def source_corr_moments(
    tier: DataFrame,
    value_col: str = "sum_n_tok",
    sources: Sequence[str] | None = None,
    lag_s: int = 0,
) -> DataFrame:
    """Exact correlation moments for every source pair over their
    shared time buckets: one row per (source_a < source_b) with
    bucket-aligned n, Σx, Σy, Σxy, Σx², Σy².

    ``lag_s`` shifts the b side: x at bucket t is paired with y at
    bucket t + lag_s — lead/lag CROSS-correlation ("does source A's
    traffic this hour predict source B's next hour?"). The pairing is
    bucket-KEYED (b's buckets are shifted before the equi-join), so
    gaps never misalign the series. With a nonzero lag the relation is
    directional, so all ordered pairs (source_a ≠ source_b) are
    emitted; at lag 0 it is symmetric and only source_a < source_b.

    Products are cast to decimal(38,0) BEFORE summing so the sums stay
    exact far past int64 (sum_n_tok per bucket can reach ~1e12 at the
    target scale; its square overflows int64 immediately).
    """
    cols = ["source", "bucket_s", F.col(value_col).alias("v")]
    t = tier.select(*cols)
    if sources is not None:
        t = t.filter(F.col("source").isin(list(sources)))
    b_side = t
    if lag_s:
        b_side = t.select(
            "source", (F.col("bucket_s") - lag_s).alias("bucket_s"), "v"
        )
    a, b = t.alias("a"), b_side.alias("b")
    # decimal(18,0) multiply inputs: the product is decimal(37,0) —
    # still exact — whereas 38×38 would exceed both engines' 38-digit
    # result cap (Spark rounds, DuckDB errors). Bucket values ≤ ~1e12
    # at target scale fit 18 digits with room.
    av = F.col("a.v").cast("decimal(18,0)")
    bv = F.col("b.v").cast("decimal(18,0)")
    pred = (
        F.col("a.source") < F.col("b.source")
        if lag_s == 0
        else F.col("a.source") != F.col("b.source")
    )
    return (
        a.join(b, "bucket_s")
        .filter(pred)
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(
            F.count("*").cast("long").alias("n_buckets"),
            F.sum(av).cast("decimal(38,0)").alias("sx"),
            F.sum(bv).cast("decimal(38,0)").alias("sy"),
            F.sum(av * bv).cast("decimal(38,0)").alias("sxy"),
            F.sum(av * av).cast("decimal(38,0)").alias("sxx"),
            F.sum(bv * bv).cast("decimal(38,0)").alias("syy"),
        )
    )


def corr_finish(moments: DataFrame) -> DataFrame:
    """Pearson r from the exact moments (float output — derived metric,
    verified against numpy in pytest rather than oracle-hashed)."""
    n = F.col("n_buckets").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    cov = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    return moments.select(
        "source_a", "source_b", "n_buckets",
        F.when(
            (var_x > 0) & (var_y > 0), cov / F.sqrt(var_x * var_y)
        ).alias("pearson_r"),
    )


def corr_moments_sql(
    relation: str, value_col: str = "sum_n_tok", lag_s: int = 0
) -> str:
    """DuckDB twin of :func:`source_corr_moments` over a named tier
    relation carrying (source, bucket_s, value_col)."""
    if lag_s:
        return f"""
SELECT a.source AS source_a,
       b.source AS source_b,
       count(*) AS n_buckets,
       CAST(sum(CAST(a.{value_col} AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sx,
       CAST(sum(CAST(b.{value_col} AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sy,
       CAST(sum(CAST(a.{value_col} AS DECIMAL(18,0))
              * CAST(b.{value_col} AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sxy,
       CAST(sum(CAST(a.{value_col} AS DECIMAL(18,0))
              * CAST(a.{value_col} AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sxx,
       CAST(sum(CAST(b.{value_col} AS DECIMAL(18,0))
              * CAST(b.{value_col} AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS syy
FROM {relation} a JOIN {relation} b ON b.bucket_s = a.bucket_s + {lag_s}
WHERE a.source <> b.source
GROUP BY 1, 2
"""
    return f"""
SELECT a.source AS source_a,
       b.source AS source_b,
       count(*) AS n_buckets,
       CAST(sum(CAST(a.{value_col} AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sx,
       CAST(sum(CAST(b.{value_col} AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sy,
       CAST(sum(CAST(a.{value_col} AS DECIMAL(18,0))
              * CAST(b.{value_col} AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sxy,
       CAST(sum(CAST(a.{value_col} AS DECIMAL(18,0))
              * CAST(a.{value_col} AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sxx,
       CAST(sum(CAST(b.{value_col} AS DECIMAL(18,0))
              * CAST(b.{value_col} AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS syy
FROM {relation} a JOIN {relation} b USING (bucket_s)
WHERE a.source < b.source
GROUP BY 1, 2
"""


def autocorr_moments(
    tier: DataFrame,
    lags: Sequence[int],
    value_col: str = "sum_n_tok",
) -> DataFrame:
    """Autocorrelation (ACF) sufficient statistics: per (source,
    lag_s), exact moments of the pairs (x(t), x(t + lag_s)) — the
    periodicity detector (a daily cycle shows as an r peak at the 24h
    lag). ``acf_finish`` derives float r per lag (pytest vs numpy).

    One join serves EVERY lag: the y side explodes the lag list
    (|lags| is a small constant) and shifts bucket-KEYED before the
    equi-join — gaps never misalign pairs, and the join input stays
    O(tier × |lags|). Products in decimal(18 → 38) exactly as
    :func:`source_corr_moments`.
    """
    t = tier.select("source", "bucket_s", F.col(value_col).alias("v"))
    lag_arr = F.array(*[F.lit(int(s)).cast("long") for s in lags])
    b = t.select(
        "source",
        F.explode(lag_arr).alias("lag_s"),
        "bucket_s",
        F.col("v").alias("vy"),
    ).withColumn("bucket_s", F.col("bucket_s") - F.col("lag_s"))
    av = F.col("v").cast("decimal(18,0)")
    bv = F.col("vy").cast("decimal(18,0)")
    return (
        t.join(b, ["source", "bucket_s"])
        .groupBy("source", "lag_s")
        .agg(
            F.count("*").cast("long").alias("n_buckets"),
            F.sum(av).cast("decimal(38,0)").alias("sx"),
            F.sum(bv).cast("decimal(38,0)").alias("sy"),
            F.sum(av * bv).cast("decimal(38,0)").alias("sxy"),
            F.sum(av * av).cast("decimal(38,0)").alias("sxx"),
            F.sum(bv * bv).cast("decimal(38,0)").alias("syy"),
        )
    )


def acf_finish(moments: DataFrame) -> DataFrame:
    """Float ACF r per (source, lag_s) from the exact moments."""
    n = F.col("n_buckets").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    cov = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    return moments.select(
        "source", "lag_s", "n_buckets",
        F.when(
            (var_x > 0) & (var_y > 0), cov / F.sqrt(var_x * var_y)
        ).alias("acf_r"),
    )


def autocorr_sql(
    relation: str, lags: Sequence[int], value_col: str = "sum_n_tok"
) -> str:
    """DuckDB twin of :func:`autocorr_moments` over a named relation."""
    lag_list = ", ".join(str(int(s)) for s in lags)
    return f"""
SELECT a.source,
       l.lag_s,
       count(*) AS n_buckets,
       CAST(sum(CAST(a.{value_col} AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sx,
       CAST(sum(CAST(b.{value_col} AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sy,
       CAST(sum(CAST(a.{value_col} AS DECIMAL(18,0))
              * CAST(b.{value_col} AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sxy,
       CAST(sum(CAST(a.{value_col} AS DECIMAL(18,0))
              * CAST(a.{value_col} AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sxx,
       CAST(sum(CAST(b.{value_col} AS DECIMAL(18,0))
              * CAST(b.{value_col} AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS syy
FROM (SELECT unnest([{lag_list}]) AS lag_s) l
CROSS JOIN {relation} a
JOIN {relation} b
  ON b.source = a.source AND b.bucket_s = a.bucket_s + l.lag_s
GROUP BY 1, 2
"""
