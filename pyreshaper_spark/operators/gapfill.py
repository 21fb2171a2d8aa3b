"""Gap-fill spine + last-observation-carried-forward (LOCF) fill.

Reference analog: a time-series output file has one slot per time step
whether or not a variable had data there; the graft mandates explicit
gap-fill (``sequence() + explode`` spine, left-outer join back) and
LOCF via ``last(..., ignorenulls=True)`` over an ordered window
[BASELINE.json:6].

Scale notes:

* The spine is generated from the per-source (min, max) bucket range —
  a tiny aggregate (|sources| rows) exploded to |sources| × |buckets|
  rows. The explode happens AFTER the aggregate, so it never touches
  raw data.
* The spine ⟕ aggregate join is an equi-join on (source, bucket_s). At
  tier granularity both sides are small relative to raw input; AQE
  picks broadcast when one side fits. No skew concern: the spine is
  uniform by construction.
* The LOCF window partitions by source and orders by bucket — one
  shuffle on source, bounded state (running last value), vectorized by
  Tungsten's window exec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyreshaper_spark.operators.rollup import AGG_COLS


def gapfill_spine(tier: DataFrame, width_s: int) -> DataFrame:
    """Dense (source, bucket_s) spine from each source's observed range."""
    return (
        tier.groupBy("source")
        .agg(F.min("bucket_s").alias("min_b"), F.max("bucket_s").alias("max_b"))
        .select(
            "source",
            F.explode(
                F.sequence("min_b", "max_b", F.lit(width_s).cast("long"))
            ).alias("bucket_s"),
        )
    )


def gapfill(tier: DataFrame, width_s: int) -> DataFrame:
    """Left-outer join the dense spine onto the tier aggregate.

    Missing buckets appear with cnt=0, null sum/min/max and
    ``filled=true`` — mirroring the reference's presence of every time
    step in an output file.
    """
    spine = gapfill_spine(tier, width_s)
    joined = spine.join(tier, on=["source", "bucket_s"], how="left_outer")
    return joined.select(
        "source",
        "bucket_s",
        F.coalesce("cnt", F.lit(0)).alias("cnt"),
        "sum_n_tok",
        "min_n_tok",
        "max_n_tok",
        F.col("cnt").isNull().alias("filled"),
    )


def locf(filled_tier: DataFrame, value_cols: tuple[str, ...] = ("sum_n_tok",)) -> DataFrame:
    """Carry the last non-null observation forward within each source.

    Adds ``<col>_locf`` columns. Buckets before a source's first
    observation remain null (nothing to carry). Order is semantic:
    the window always orders by bucket_s — never relies on incidental
    partition layout.
    """
    w = (
        Window.partitionBy("source")
        .orderBy("bucket_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = filled_tier
    for c in value_cols:
        out = out.withColumn(f"{c}_locf", F.last(c, ignorenulls=True).over(w))
    return out


def gapfill_locf(tier: DataFrame, width_s: int) -> DataFrame:
    """Convenience: spine → left-outer join → LOCF on sum_n_tok."""
    return locf(gapfill(tier, width_s))


__all__ = ["gapfill_spine", "gapfill", "locf", "gapfill_locf", "AGG_COLS"]
