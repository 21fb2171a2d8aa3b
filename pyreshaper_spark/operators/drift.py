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
