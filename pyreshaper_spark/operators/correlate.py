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


def _pair_series(
    tier, value_col: str, sources=None
):
    """(source_a < source_b, bucket_s, va, vb): the bucket-aligned
    pair series every pairwise-correlation operator starts from —
    shared by Pearson, Spearman, and Kendall."""
    cols = ["source", "bucket_s", F.col(value_col).alias("v")]
    t = tier.select(*cols)
    if sources is not None:
        t = t.filter(F.col("source").isin(list(sources)))
    a, b = t.alias("a"), t.alias("b")
    return (
        a.join(b, "bucket_s")
        .filter(F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            F.col("bucket_s"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
        )
    )


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


def source_spearman_moments(
    tier: DataFrame,
    value_col: str = "sum_n_tok",
    sources: Sequence[str] | None = None,
) -> DataFrame:
    """Spearman (rank) correlation moments for every source pair —
    the robust co-movement face: monotone but non-linear coupling and
    heavy-tailed bursts that distort Pearson leave rank correlation
    intact.

    Exact cross-engine evaluation: within each pair's shared-bucket
    set, ties get AVERAGE ranks, kept integer by doubling via the
    two-sided rank identity ``rank2 = rank_asc + n + 1 - rank_desc``
    (for a tie block occupying positions r..r+c-1, rank_asc = r and
    rank_desc = n-r-c+2, so rank2 = 2r+c-1 = twice the average rank).
    The output is the same exact sufficient-statistics contract as
    :func:`source_corr_moments`, computed over (rank2_x, rank2_y);
    ``corr_finish`` on these moments yields Spearman's rho.

    Scale shape: the bucket equi-join of the Pearson path, then ONE
    pair-keyed exchange carrying all four rank sorts (asc/desc ×
    x/y) — ranking needs the pair's rows co-located, but never a
    second shuffle key.
    """
    pairs = _pair_series(tier, value_col, sources)
    from pyspark.sql import Window

    part = Window.partitionBy("source_a", "source_b")

    def rank2(col: str):
        asc = F.rank().over(part.orderBy(F.col(col).asc()))
        desc = F.rank().over(part.orderBy(F.col(col).desc()))
        n = F.count("*").over(part)
        return (asc + n + 1 - desc).cast("decimal(18,0)")

    ranked = pairs.select(
        "source_a", "source_b",
        rank2("va").alias("rx"), rank2("vb").alias("ry"),
    )
    return ranked.groupBy("source_a", "source_b").agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.sum("rx").cast("decimal(38,0)").alias("sx"),
        F.sum("ry").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("decimal(38,0)").alias("syy"),
    )


def spearman_moments_sql(relation: str, value_col: str = "sum_n_tok") -> str:
    """DuckDB twin of :func:`source_spearman_moments` (same doubled
    average-rank identity, same moment contract)."""
    return f"""
SELECT source_a, source_b,
       count(*) AS n_buckets,
       CAST(sum(rx) AS DECIMAL(38,0))      AS sx,
       CAST(sum(ry) AS DECIMAL(38,0))      AS sy,
       CAST(sum(rx * ry) AS DECIMAL(38,0)) AS sxy,
       CAST(sum(rx * rx) AS DECIMAL(38,0)) AS sxx,
       CAST(sum(ry * ry) AS DECIMAL(38,0)) AS syy
FROM (
  SELECT source_a, source_b,
         CAST(rank() OVER (PARTITION BY source_a, source_b ORDER BY va ASC)
              + count(*) OVER (PARTITION BY source_a, source_b) + 1
              - rank() OVER (PARTITION BY source_a, source_b ORDER BY va DESC)
              AS DECIMAL(18,0)) AS rx,
         CAST(rank() OVER (PARTITION BY source_a, source_b ORDER BY vb ASC)
              + count(*) OVER (PARTITION BY source_a, source_b) + 1
              - rank() OVER (PARTITION BY source_a, source_b ORDER BY vb DESC)
              AS DECIMAL(18,0)) AS ry
  FROM (
    SELECT a.source AS source_a, b.source AS source_b, a.bucket_s,
           CAST(a.{value_col} AS BIGINT) AS va,
           CAST(b.{value_col} AS BIGINT) AS vb
    FROM {relation} a JOIN {relation} b USING (bucket_s)
    WHERE a.source < b.source
  )
)
GROUP BY 1, 2
"""


def source_kendall_counts(
    tier: DataFrame,
    value_col: str = "sum_n_tok",
    sources: Sequence[str] | None = None,
    max_buckets: int | None = None,
) -> DataFrame:
    """Kendall tau-b pair counts for every source pair over their
    shared time buckets: one row per (source_a < source_b) with the
    exact concordant / discordant / tie bookkeeping

        nc, nd, tie_x, tie_y, tie_xy      (all BIGINT)

    classified purely by comparisons (no products — a 1e12-scale value
    difference squared would overflow int64, and sign() returns float;
    ``(dx > 0) == (dy > 0)`` needs neither). tau-b itself is the
    derived float (:func:`kendall_finish`, pytest vs a brute-force
    reference, not oracle-hashed).

    Scale shape: bucket equi-join to form the pair series (as the
    Pearson/Spearman paths), then ONE self-join keyed on (source_a,
    source_b) with the triangular predicate p.bucket_s < q.bucket_s —
    cost O(pairs × B²) for B shared buckets. That quadratic is
    intrinsic to Kendall (every bucket pair is classified); it is the
    dashboard regime (B = hundreds for a month of hourly buckets).
    For wide scans pass ``sources=`` or pre-slice the tier's time
    range — the knob is selection, the join stays equi-keyed.

    ``max_buckets`` is the hard misuse guard (the `max_bucket` /
    `max_df` pattern from the dedup stack): source pairs sharing MORE
    than ``max_buckets`` buckets are dropped BEFORE the triangular
    self-join, bounding its cost at pairs × max_buckets² even when a
    caller points the operator at an unsliced multi-year tier. Dropped
    pairs are absent from the output (compute them on a pre-sliced
    range instead); ``None`` keeps the unbounded dashboard regime.
    """
    from pyspark.sql import Window

    pairs = _pair_series(tier, value_col, sources)
    if max_buckets is not None:
        if max_buckets < 2:
            raise ValueError("max_buckets must be >= 2")
        wcnt = Window.partitionBy("source_a", "source_b")
        pairs = (
            pairs.withColumn("_nb", F.count("*").over(wcnt))
            .filter(F.col("_nb") <= max_buckets)
            .drop("_nb")
        )
    p, q = pairs.alias("p"), pairs.alias("q")
    dx0 = F.col("p.va") == F.col("q.va")
    dy0 = F.col("p.vb") == F.col("q.vb")
    up_x = F.col("q.va") > F.col("p.va")
    up_y = F.col("q.vb") > F.col("p.vb")

    def _n(cond) -> F.Column:
        return F.sum(cond.cast("long")).cast("long")

    classified = p.join(
        q,
        (F.col("p.source_a") == F.col("q.source_a"))
        & (F.col("p.source_b") == F.col("q.source_b"))
        & (F.col("p.bucket_s") < F.col("q.bucket_s")),
    )
    return classified.groupBy(
        F.col("p.source_a").alias("source_a"),
        F.col("p.source_b").alias("source_b"),
    ).agg(
        # B from the triangular total: nc+nd+ties = B(B-1)/2
        (
            (
                F.lit(1)
                + F.sqrt(F.lit(1) + F.lit(8) * F.count("*"))
            ) / F.lit(2)
        ).cast("long").alias("n_buckets"),
        _n(~dx0 & ~dy0 & (up_x == up_y)).alias("nc"),
        _n(~dx0 & ~dy0 & (up_x != up_y)).alias("nd"),
        _n(dx0 & ~dy0).alias("tie_x"),
        _n(~dx0 & dy0).alias("tie_y"),
        _n(dx0 & dy0).alias("tie_xy"),
    )


def kendall_finish(counts: DataFrame) -> DataFrame:
    """tau-b from the exact pair counts (float output — derived
    metric): (nc−nd) / sqrt((n0−n1)(n0−n2)) with n0 the triangular
    total, n1/n2 the x/y tie-pair counts; NULL when either margin has
    zero variance (all pairs tied on that side)."""
    nc, nd = F.col("nc"), F.col("nd")
    n0 = nc + nd + F.col("tie_x") + F.col("tie_y") + F.col("tie_xy")
    n1 = F.col("tie_x") + F.col("tie_xy")
    n2 = F.col("tie_y") + F.col("tie_xy")
    d1, d2 = (n0 - n1).cast("double"), (n0 - n2).cast("double")
    return counts.select(
        "source_a", "source_b", "n_buckets",
        F.when(
            (d1 > 0) & (d2 > 0),
            (nc - nd).cast("double") / F.sqrt(d1 * d2),
        ).alias("tau_b"),
    )


def kendall_counts_sql(
    relation: str,
    value_col: str = "sum_n_tok",
    max_buckets: int | None = None,
) -> str:
    """DuckDB twin of :func:`source_kendall_counts` (same comparison
    classification, same triangular n_buckets recovery;
    ``max_buckets`` mirrors the pre-self-join guard — source pairs
    sharing more buckets are dropped before classification)."""
    qualify = (
        "\n    QUALIFY count(*) OVER (PARTITION BY a.source, b.source)"
        f" <= {max_buckets}"
        if max_buckets is not None
        else ""
    )
    return f"""
SELECT source_a, source_b,
       CAST((1 + sqrt(1 + 8 * count(*))) / 2 AS BIGINT) AS n_buckets,
       CAST(sum(CASE WHEN p_va <> q_va AND p_vb <> q_vb
                      AND ((q_va > p_va) = (q_vb > p_vb))
                THEN 1 ELSE 0 END) AS BIGINT) AS nc,
       CAST(sum(CASE WHEN p_va <> q_va AND p_vb <> q_vb
                      AND ((q_va > p_va) <> (q_vb > p_vb))
                THEN 1 ELSE 0 END) AS BIGINT) AS nd,
       CAST(sum(CASE WHEN p_va = q_va AND p_vb <> q_vb
                THEN 1 ELSE 0 END) AS BIGINT) AS tie_x,
       CAST(sum(CASE WHEN p_va <> q_va AND p_vb = q_vb
                THEN 1 ELSE 0 END) AS BIGINT) AS tie_y,
       CAST(sum(CASE WHEN p_va = q_va AND p_vb = q_vb
                THEN 1 ELSE 0 END) AS BIGINT) AS tie_xy
FROM (
  WITH pairs AS (
    SELECT a.source AS source_a, b.source AS source_b, a.bucket_s,
           CAST(a.{value_col} AS BIGINT) AS va,
           CAST(b.{value_col} AS BIGINT) AS vb
    FROM {relation} a JOIN {relation} b USING (bucket_s)
    WHERE a.source < b.source{qualify}
  )
  SELECT p.source_a, p.source_b,
         p.va AS p_va, p.vb AS p_vb, q.va AS q_va, q.vb AS q_vb
  FROM pairs p
  JOIN pairs q
    ON q.source_a = p.source_a AND q.source_b = p.source_b
   AND p.bucket_s < q.bucket_s
)
GROUP BY 1, 2
"""


def source_ccf_moments(
    tier: DataFrame,
    max_lag: int,
    width_s: int,
    value_col: str = "sum_n_tok",
) -> DataFrame:
    """Cross-correlation FUNCTION between sources: the exact Pearson
    moments of :func:`source_corr_moments` at every lag 0..``max_lag``
    (in bucket steps of ``width_s``) in ONE pass — the lead/lag curve
    a dashboard plots to find "source A leads source B by ℓ hours"
    (argmax over the finished r).

    One ordered row per (source_a ≠ source_b, lag): x = a's value at
    bucket t, y = b's value at bucket t + lag·width_s — bucket-KEYED
    (b's buckets are shifted per lag before the equi-join) so gaps
    never misalign the pairing. Lag 0 appears for both orientations
    with mirrored moments; consumers wanting the symmetric view filter
    source_a < source_b at lag 0.

    Scale shape: the b side fans out by the constant (max_lag+1) via
    posexplode — map-side, no extra shuffle — then the same
    bucket-keyed equi-join and partial+final moment agg as the
    single-lag operator. Products are decimal(18,0)×decimal(18,0)
    before the decimal(38,0) sums, exact past 1e12-per-bucket values.
    """
    t = tier.select("source", "bucket_s", F.col(value_col).alias("v"))
    lag_arr = F.array(*[F.lit(i) for i in range(max_lag + 1)])
    b_side = t.select(
        "source",
        F.explode(lag_arr).alias("lag"),
        "bucket_s",
        "v",
    ).select(
        "source",
        "lag",
        (F.col("bucket_s") - F.col("lag") * width_s).alias("bucket_s"),
        "v",
    )
    a, b = t.alias("a"), b_side.alias("b")
    av = F.col("a.v").cast("decimal(18,0)")
    bv = F.col("b.v").cast("decimal(18,0)")
    return (
        a.join(b, "bucket_s")
        .filter(F.col("a.source") != F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            F.col("b.lag").cast("long").alias("lag"),
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


def ccf_sql(
    relation: str,
    max_lag: int,
    width_s: int,
    value_col: str = "sum_n_tok",
) -> str:
    """DuckDB twin of :func:`source_ccf_moments` over a named tier
    relation carrying (source, bucket_s, value_col)."""
    lags = ", ".join(f"({i})" for i in range(max_lag + 1))
    return f"""
SELECT a.source                                   AS source_a,
       b.source                                   AS source_b,
       CAST(b.lag AS BIGINT)                      AS lag,
       count(*)                                   AS n_buckets,
       CAST(sum(CAST(a.v AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sx,
       CAST(sum(CAST(b.v AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sy,
       CAST(sum(CAST(a.v AS DECIMAL(18,0))
              * CAST(b.v AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sxy,
       CAST(sum(CAST(a.v AS DECIMAL(18,0))
              * CAST(a.v AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sxx,
       CAST(sum(CAST(b.v AS DECIMAL(18,0))
              * CAST(b.v AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS syy
FROM (SELECT source, bucket_s, {value_col} AS v FROM {relation}) a
JOIN (
  SELECT source, lag, bucket_s - lag * {width_s} AS bucket_s, v
  FROM (SELECT source, bucket_s, {value_col} AS v FROM {relation})
  CROSS JOIN (VALUES {lags}) l(lag)
) b ON a.bucket_s = b.bucket_s AND a.source <> b.source
GROUP BY 1, 2, 3
"""


def ccf_finish(moments: DataFrame) -> DataFrame:
    """Pearson r per (pair, lag) + the argmax lag per pair (float —
    derived metric, pytest vs numpy)."""
    from pyspark.sql import Window as W

    r = corr_finish_cols(moments).withColumn(
        "best_lag",
        F.first("lag").over(
            W.partitionBy("source_a", "source_b").orderBy(
                F.col("pearson_r").desc_nulls_last(), F.col("lag").asc()
            )
        ),
    )
    return r


def corr_finish_cols(moments: DataFrame) -> DataFrame:
    """corr_finish keeping every non-moment carry column (lag etc.)."""
    n = F.col("n_buckets").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    cov = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    keep = [c for c in moments.columns
            if c not in ("sx", "sy", "sxy", "sxx", "syy")]
    return moments.select(
        *keep,
        F.when(
            (var_x > 0) & (var_y > 0), cov / F.sqrt(var_x * var_y)
        ).alias("pearson_r"),
    )
