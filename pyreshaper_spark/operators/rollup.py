"""Continuous aggregates: tier-0 rollup + exact cascading re-aggregation.

Reference analog: the slice→series conversion writes one time-series
output per variable [U: reshaper.py :: Slice2SeriesReshaper.convert];
here each retention tier is a (source × bucket) continuous aggregate
and tier *k+1* is computed FROM tier *k* (never from raw) so the
cascade is one cheap re-aggregation per tier — the shuffle that matters
happens exactly once, at tier 0.

Exactness: ``n_tok`` is integral; sums are ``long``; count/sum/min/max
compose associatively across tiers (``sum_n_tok = sum(sum_n_tok)``,
``cnt = sum(cnt)``, ``min = min(min)``, ``max = max(max)``) — no float
drift, verified bucket-for-bucket against the DuckDB oracle.

Scale notes (100 TB design point):

* Tier 0 projects ``(source, bucket_s, n_tok)`` BEFORE aggregating —
  the wide ``tokens`` array must never enter this shuffle. Catalyst
  column pruning pushes the 3-column ReadSchema into the parquet scan.
* Spark performs partial (map-side) + final hash aggregation
  automatically; with ~sources × minutes grouping keys the partial agg
  collapses each input partition to a few thousand rows before the
  exchange, so shuffle volume is O(groups), not O(rows).
* Tier k+1 input is already tiny (tier-k output); AQE coalesces its
  shuffle partitions at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Aggregate column names shared by every tier (and by the oracle SQL).
AGG_COLS = ("cnt", "sum_n_tok", "min_n_tok", "max_n_tok")


def bucket_col(width_s: int, src: str = "event_s") -> F.Column:
    """Integer time bucket: floor(event_s / width) * width.

    Integer epoch-second arithmetic (≡ ``date_trunc`` in UTC for the
    standard tiers) keeps buckets exact and engine-portable.
    """
    return ((F.col(src) / width_s).cast("long") * width_s).alias("bucket_s")


def rollup_tier0(seq: DataFrame, width_s: int) -> DataFrame:
    """Tier-0 continuous aggregate from the raw sequences table.

    Input must carry ``event_s`` (see operators.event_time). Output:
    (source, bucket_s, cnt, sum_n_tok, min_n_tok, max_n_tok).
    """
    return (
        seq.select("source", bucket_col(width_s), "n_tok")
        .groupBy("source", "bucket_s")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("n_tok").alias("sum_n_tok"),
            F.min("n_tok").alias("min_n_tok"),
            F.max("n_tok").alias("max_n_tok"),
        )
    )


def rollup_cascade(prev_tier: DataFrame, width_s: int) -> DataFrame:
    """Tier k+1 from tier k — exact re-aggregation, no raw-data rescan."""
    return (
        prev_tier.select(
            "source",
            ((F.col("bucket_s") / width_s).cast("long") * width_s).alias("bucket_s"),
            *AGG_COLS,
        )
        .groupBy("source", "bucket_s")
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum_n_tok").alias("sum_n_tok"),
            F.min("min_n_tok").alias("min_n_tok"),
            F.max("max_n_tok").alias("max_n_tok"),
        )
    )


def apply_retention(
    tier: DataFrame, width_s: int, keep_buckets: int
) -> DataFrame:
    """Retention policy: keep only the newest ``keep_buckets`` buckets
    (TimescaleDB-style drop-by-age, against the table's high-water mark
    so reruns on frozen data are deterministic).

    The threshold is one scalar aggregate broadcast into a filter —
    at scale this prunes tier partitions at planning time when the
    table is partitioned by bucket range.
    """
    hw = tier.agg(F.max("bucket_s").alias("hw"))
    return (
        tier.crossJoin(F.broadcast(hw))
        .filter(
            F.col("bucket_s") > F.col("hw") - F.lit(keep_buckets * width_s)
        )
        .drop("hw")
    )


def bucket_percentiles(seq: DataFrame, width_s: int) -> DataFrame:
    """Exact p25/p50/p75 of ``n_tok`` per (source, bucket) — the
    latency-style distribution rollup monitoring stacks keep next to
    count/sum/min/max.

    Exactness across engines: Spark ``percentile`` and DuckDB
    ``quantile_cont`` both linearly interpolate at pos=(n−1)·q; with
    q ∈ {.25, .5, .75} the fraction and the integer endpoints are all
    exactly representable doubles, so results are bit-identical.

    Scale note: exact percentile buffers each group's values
    (O(bucket rows) executor memory) — fine at tier granularity where a
    bucket holds minutes of one source. For percentiles over huge
    groups the production path is ``approx_percentile`` (t-digest,
    mergeable map-side), which is deliberately NOT oracle-checked.
    """
    return (
        seq.select("source", bucket_col(width_s), "n_tok")
        .groupBy("source", "bucket_s")
        .agg(
            F.count("*").alias("cnt"),
            F.expr("percentile(n_tok, 0.25)").alias("p25_n_tok"),
            F.expr("percentile(n_tok, 0.5)").alias("p50_n_tok"),
            F.expr("percentile(n_tok, 0.75)").alias("p75_n_tok"),
        )
    )


def bucket_percentiles_approx(
    seq: DataFrame, width_s: int, accuracy: int = 10000
) -> DataFrame:
    """Production-scale percentile rollup: ``approx_percentile``
    (t-digest-style sketch — mergeable map-side, O(accuracy) state per
    group instead of O(rows)). The exact variant above is the oracle;
    this is what a 10^12-row deployment runs on huge buckets. No SQL
    oracle (sketch results are engine-specific); correctness is bounded
    against the exact op in pytest."""
    return (
        seq.select("source", bucket_col(width_s), "n_tok")
        .groupBy("source", "bucket_s")
        .agg(
            F.count("*").alias("cnt"),
            F.expr(
                f"approx_percentile(n_tok, array(0.25, 0.5, 0.75), {accuracy})"
            ).alias("pcts"),
        )
        .select(
            "source", "bucket_s", "cnt",
            F.col("pcts")[0].alias("p25_n_tok"),
            F.col("pcts")[1].alias("p50_n_tok"),
            F.col("pcts")[2].alias("p75_n_tok"),
        )
    )


def bucket_percentiles_sql(width_s: int) -> str:
    """DuckDB twin of :func:`bucket_percentiles` (over the `sequences`
    CTE the tier oracles already build)."""
    return f"""
SELECT source,
       (event_s // {width_s}) * {width_s} AS bucket_s,
       count(*)                           AS cnt,
       quantile_cont(n_tok, 0.25)         AS p25_n_tok,
       quantile_cont(n_tok, 0.5)          AS p50_n_tok,
       quantile_cont(n_tok, 0.75)         AS p75_n_tok
FROM sequences
GROUP BY 1, 2
"""


def rollup_all_tiers(seq: DataFrame, widths: list[int]) -> dict[int, DataFrame]:
    """Full cascade: widths must be strictly increasing and divide evenly.

    Returns {width_s: tier DataFrame}. Only the first tier touches the
    raw table; each subsequent tier re-aggregates its predecessor.
    """
    tiers: dict[int, DataFrame] = {}
    prev: DataFrame | None = None
    for w in widths:
        prev = rollup_tier0(seq, w) if prev is None else rollup_cascade(prev, w)
        tiers[w] = prev
    return tiers
