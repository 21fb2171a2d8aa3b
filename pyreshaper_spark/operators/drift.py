"""Distribution drift over time — exact total-variation distance
between consecutive time buckets of a value histogram.

The data-freshness monitor of a training corpus: "did the n_tok
(sequence length) distribution of source X shift between yesterday and
today?" — the signal that an upstream scraper, tokenizer, or filter
changed behavior. Computed over the HISTOGRAM tier (never raw rows),
so cost is O(sources × buckets × occupied bins) regardless of corpus
size, and it composes with ``rollup.histogram_cascade`` the same way
every other analytic rides the cascade.

Exactness: TVD(p, q) = ½ Σ_bins |p_i − q_i| with p_i = c_i/T_c,
q_i = d_i/T_d is emitted as the exact integer rational

    tvd_num = Σ |c_i·T_d − d_i·T_c|,    tvd_den = 2·T_c·T_d

(decimal(38,0) — bucket totals can reach ~1e12 at target scale, so the
cross products exceed int64; same 18-digit-multiplicand discipline as
``correlate.source_corr_moments``). The float TVD ∈ [0,1] is a derived
metric (:func:`tvd_finish`), pytest-checked, not oracle-hashed.

Pairing is bucket-KEYED (cur.bucket_s = prev.bucket_s + width), not a
row-number lag, so missing buckets never shift the comparison — the
same discipline as ``gapfill.seasonal_diff``. Buckets without a
predecessor emit nothing (drift needs two samples).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyreshaper_spark.operators.rollup import floor_sql

_D18 = "decimal(18,0)"


def histogram_drift_tvd(hist: DataFrame, width_s: int) -> DataFrame:
    """Exact TVD between each histogram bucket and its predecessor.

    ``hist`` carries (source, bucket_s, bin_lo, cnt) — the output of
    :func:`rollup.bucket_histogram` or :func:`rollup.histogram_cascade`
    at bucket width ``width_s``. Returns one row per (source, bucket)
    that has a direct predecessor bucket: (source, bucket_s, n_bins,
    tvd_num, tvd_den).

    Plan shape: two hash aggregates over the tier + one full-outer
    equi-join on (source, bucket, bin) + one inner equi-join on
    (source, bucket) — no window, no cross product; every key includes
    source so nothing funnels into one partition."""
    zero = F.lit(0).cast(_D18)
    tot = hist.groupBy("source", "bucket_s").agg(
        F.sum("cnt").cast(_D18).alias("tot")
    )
    pairs = tot.join(
        tot.select(
            "source",
            (F.col("bucket_s") + width_s).alias("bucket_s"),
            F.col("tot").alias("tot_prev"),
        ),
        ["source", "bucket_s"],
    )
    cur = hist.select(
        "source", "bucket_s", "bin_lo", F.col("cnt").cast(_D18).alias("c_cur")
    )
    prev = hist.select(
        "source",
        (F.col("bucket_s") + width_s).alias("bucket_s"),
        "bin_lo",
        F.col("cnt").cast(_D18).alias("c_prev"),
    )
    bins = cur.join(prev, ["source", "bucket_s", "bin_lo"], "full_outer").select(
        "source",
        "bucket_s",
        F.coalesce("c_cur", zero).alias("c_cur"),
        F.coalesce("c_prev", zero).alias("c_prev"),
    )
    return (
        bins.join(pairs, ["source", "bucket_s"])
        .groupBy("source", "bucket_s", "tot", "tot_prev")
        .agg(
            F.count("*").cast("long").alias("n_bins"),
            F.sum(
                F.abs(
                    F.col("c_cur") * F.col("tot_prev")
                    - F.col("c_prev") * F.col("tot")
                )
            )
            .cast("decimal(38,0)")
            .alias("tvd_num"),
        )
        .select(
            "source",
            "bucket_s",
            "n_bins",
            "tvd_num",
            (F.lit(2).cast(_D18) * F.col("tot") * F.col("tot_prev"))
            .cast("decimal(38,0)")
            .alias("tvd_den"),
        )
    )


def tvd_finish(drift: DataFrame) -> DataFrame:
    """Float TVD ∈ [0,1] from the exact rational (derived metric —
    pytest-checked against a Python reference, not oracle-hashed)."""
    return drift.select(
        "source",
        "bucket_s",
        (F.col("tvd_num").cast("double") / F.col("tvd_den").cast("double"))
        .alias("tvd"),
    )


def ks_drift(seq: DataFrame, width_s: int) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic between each time
    bucket's ``n_tok`` distribution and its predecessor's.

    D = max_v |F_cur(v) − F_prev(v)| evaluated at the union of support
    points (ECDFs are step functions, so that max is exact) and emitted
    as the integer rational

        ks_num = max_v |cum_cur(v)·T_prev − cum_prev(v)·T_cur|
        ks_den = T_cur · T_prev

    The unbinned complement of :func:`histogram_drift_tvd`: KS sees a
    median shift WITHIN one histogram bin that TVD-over-bins cannot.

    Scale shape: raw rows collapse to per-(source, bucket, value)
    counts in one partial+final hash agg (O(sources × buckets ×
    distinct values) — ``n_tok`` is bounded, so this is tier-sized);
    the ECDF runs inside a (source, bucket) window partition — never a
    global sort; the bucket pairing is keyed, not lagged."""
    from pyspark.sql import Window

    from pyreshaper_spark.operators.rollup import bucket_col

    zero = F.lit(0).cast(_D18)
    vc = (
        seq.select("source", bucket_col(width_s), "n_tok")
        .groupBy("source", "bucket_s", "n_tok")
        .agg(F.count("*").cast(_D18).alias("c"))
    )
    tot = vc.groupBy("source", "bucket_s").agg(F.sum("c").alias("tot"))
    pairs = tot.join(
        tot.select(
            "source",
            (F.col("bucket_s") + width_s).alias("bucket_s"),
            F.col("tot").alias("tot_prev"),
        ),
        ["source", "bucket_s"],
    )
    cur = vc.select("source", "bucket_s", "n_tok", F.col("c").alias("c_cur"))
    prev = vc.select(
        "source",
        (F.col("bucket_s") + width_s).alias("bucket_s"),
        "n_tok",
        F.col("c").alias("c_prev"),
    )
    both = cur.join(prev, ["source", "bucket_s", "n_tok"], "full_outer").select(
        "source",
        "bucket_s",
        "n_tok",
        F.coalesce("c_cur", zero).alias("c_cur"),
        F.coalesce("c_prev", zero).alias("c_prev"),
    )
    w = (
        Window.partitionBy("source", "bucket_s")
        .orderBy("n_tok")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cums = both.select(
        "source",
        "bucket_s",
        F.sum("c_cur").over(w).alias("cum_c"),
        F.sum("c_prev").over(w).alias("cum_p"),
    )
    return (
        cums.join(pairs, ["source", "bucket_s"])
        .groupBy("source", "bucket_s", "tot", "tot_prev")
        .agg(
            F.max(
                F.abs(
                    F.col("cum_c") * F.col("tot_prev")
                    - F.col("cum_p") * F.col("tot")
                )
            )
            .cast("decimal(38,0)")
            .alias("ks_num")
        )
        .select(
            "source",
            "bucket_s",
            "ks_num",
            (F.col("tot") * F.col("tot_prev"))
            .cast("decimal(38,0)")
            .alias("ks_den"),
        )
    )


def ks_finish(drift: DataFrame) -> DataFrame:
    """Float KS D ∈ [0,1] from the exact rational (derived metric)."""
    return drift.select(
        "source",
        "bucket_s",
        (F.col("ks_num").cast("double") / F.col("ks_den").cast("double"))
        .alias("ks_d"),
    )


def ks_drift_sql(width_s: int) -> str:
    """DuckDB twin of :func:`ks_drift` direct from ``sequences``. Emits
    a CTE-list continuation (leading comma)."""
    return f""",
vc AS (
  SELECT source, {floor_sql('event_s', width_s)} AS bucket_s, n_tok,
         CAST(count(*) AS DECIMAL(18,0)) AS c
  FROM sequences GROUP BY 1, 2, 3
),
tot AS (SELECT source, bucket_s, sum(c) AS tot FROM vc GROUP BY 1, 2),
kpairs AS (
  SELECT c.source, c.bucket_s, c.tot, p.tot AS tot_prev
  FROM tot c JOIN tot p
    ON p.source = c.source AND p.bucket_s = c.bucket_s - {width_s}
),
kboth AS (
  SELECT coalesce(c.source, p.source)                 AS source,
         coalesce(c.bucket_s, p.bucket_s + {width_s}) AS bucket_s,
         coalesce(c.n_tok, p.n_tok)                   AS n_tok,
         coalesce(c.c, 0)                             AS c_cur,
         coalesce(p.c, 0)                             AS c_prev
  FROM vc c FULL OUTER JOIN vc p
    ON p.source = c.source AND p.bucket_s = c.bucket_s - {width_s}
   AND p.n_tok = c.n_tok
),
kcums AS (
  SELECT source, bucket_s,
         sum(c_cur)  OVER w AS cum_c,
         sum(c_prev) OVER w AS cum_p
  FROM kboth
  WINDOW w AS (PARTITION BY source, bucket_s ORDER BY n_tok
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT b.source, b.bucket_s,
       CAST(max(abs(b.cum_c * t.tot_prev - b.cum_p * t.tot))
            AS DECIMAL(38,0))                       AS ks_num,
       CAST(t.tot * t.tot_prev AS DECIMAL(38,0))    AS ks_den
FROM kcums b JOIN kpairs t USING (source, bucket_s)
GROUP BY b.source, b.bucket_s, t.tot, t.tot_prev
"""


def histogram_drift_sql(relation: str, width_s: int) -> str:
    """DuckDB twin of :func:`histogram_drift_tvd`. Emits a CTE-list
    continuation: append after an open ``WITH …`` list (leading comma
    included)."""
    return f""",
tot AS (
  SELECT source, bucket_s, CAST(sum(cnt) AS DECIMAL(18,0)) AS tot
  FROM {relation} GROUP BY 1, 2
),
tpairs AS (
  SELECT c.source, c.bucket_s, c.tot, p.tot AS tot_prev
  FROM tot c JOIN tot p
    ON p.source = c.source AND p.bucket_s = c.bucket_s - {width_s}
),
dbins AS (
  SELECT coalesce(c.source, p.source)                   AS source,
         coalesce(c.bucket_s, p.bucket_s + {width_s})   AS bucket_s,
         coalesce(CAST(c.cnt AS DECIMAL(18,0)), 0)      AS c_cur,
         coalesce(CAST(p.cnt AS DECIMAL(18,0)), 0)      AS c_prev
  FROM {relation} c FULL OUTER JOIN {relation} p
    ON p.source = c.source AND p.bucket_s = c.bucket_s - {width_s}
   AND p.bin_lo = c.bin_lo
)
SELECT b.source, b.bucket_s,
       count(*)                                                  AS n_bins,
       CAST(sum(abs(b.c_cur * t.tot_prev - b.c_prev * t.tot))
            AS DECIMAL(38,0))                                    AS tvd_num,
       CAST(2 * t.tot * t.tot_prev AS DECIMAL(38,0))             AS tvd_den
FROM dbins b JOIN tpairs t USING (source, bucket_s)
GROUP BY b.source, b.bucket_s, t.tot, t.tot_prev
"""


def benford_counts(seq: DataFrame, value_col: str = "n_tok") -> DataFrame:
    """Benford first-significant-digit distribution per source — the
    fabricated-data / broken-upstream detector (organically generated
    magnitudes follow log10(1 + 1/d); a synthetic filler or a
    truncation bug shows up as a flat or spiked digit profile).

    The leading digit is taken from the DECIMAL RENDERING
    (``substring(cast(v as string), 1, 1)``), not ``log10`` — float
    log at exact powers of ten is not guaranteed to floor identically
    across engines, while integer-to-string is byte-identical in both.
    Non-positive values are excluded (Benford is defined on positive
    magnitudes). One hash aggregate, output O(sources × 9).
    """
    v = F.col(value_col)
    return (
        seq.filter(v > 0)
        .select(
            "source",
            F.substring(v.cast("string"), 1, 1).cast("int").alias("digit"),
        )
        .groupBy("source", "digit")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


def benford_finish(counts: DataFrame) -> DataFrame:
    """Observed vs Benford-expected share per (source, digit) — float
    faces of the exact counts (derived metric, pytest-checked)."""
    from pyspark.sql import Window

    tot = F.sum("n_docs").over(Window.partitionBy("source"))
    return counts.select(
        "source", "digit", "n_docs",
        (F.col("n_docs").cast("double") / tot).alias("obs_share"),
        F.log10(1.0 + 1.0 / F.col("digit")).alias("benford_share"),
    )


def benford_sql(relation: str, value_col: str = "n_tok") -> str:
    """DuckDB twin of :func:`benford_counts`."""
    return f"""
SELECT source,
       CAST(substring(CAST({value_col} AS VARCHAR), 1, 1) AS INTEGER)
         AS digit,
       CAST(count(*) AS BIGINT) AS n_docs
FROM {relation}
WHERE {value_col} > 0
GROUP BY 1, 2
"""
