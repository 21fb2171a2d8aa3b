"""SQL surface: expose IcebergLite tables + the raw input as temp views
so users can ``spark.sql`` over the engine's outputs.

    from pyreshaper_spark.sql import register_views
    register_views(spark, cfg)
    spark.sql("SELECT * FROM tier_1h WHERE source = 'src3'").show()

Views are plain DataFrame temp views over the CURRENT snapshot of each
table; re-register after new commits (or pass ``snapshot_ids`` for
time travel).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from pyreshaper_spark.config import RunConfig
from pyreshaper_spark.sources.catalog import TableCatalog, get_catalog


def register_views(
    spark: SparkSession,
    cfg: RunConfig,
    snapshot_ids: dict[str, int] | None = None,
) -> list[str]:
    """Register a temp view per catalog table (+ ``sequences`` for the
    input). Returns the registered view names."""
    cat = get_catalog(cfg.output_path)
    names: list[str] = []
    spark.read.parquet(cfg.input_path).createOrReplaceTempView("sequences")
    names.append("sequences")
    import os

    root = cat.root
    if os.path.isdir(root):
        for t in sorted(os.listdir(root)):
            if not cat.exists(t):
                continue
            sid = (snapshot_ids or {}).get(t)
            cat.read(spark, t, snapshot_id=sid).createOrReplaceTempView(t)
            names.append(t)
    return names


def read_rollup(
    spark: SparkSession,
    cfg: RunConfig,
    width_s: int,
    sources: list[str] | None = None,
    t_min: int | None = None,
    t_max: int | None = None,
    realtime: bool = False,
):
    """Tier-routed rollup read — the query-planner face of the cascade.

    Picks the coarsest committed tier whose width divides ``width_s``
    (:func:`operators.rollup.pick_tier`), reads it pruned
    (:func:`read_tier` — manifest partition/stats pruning), and
    re-aggregates to the requested width (exact by associativity). A
    45-minute chart over a 1m/5m/1h ladder reads the 5m tier, never
    raw.

    ``realtime=True`` is the TimescaleDB real-time-continuous-aggregate
    analog: rows of the raw input not yet ingested (files absent from
    the encode lineage's ``input_files`` — the same pending-file set an
    append cycle would process) are aggregated on the fly and merged
    into the materialized read, so queries see data that arrived after
    the last pipeline run without rescanning history. Cost is
    O(buckets) + O(new rows). Caveats: the materialized leg reflects
    any retention pruning already applied (pass ``t_min`` inside the
    retention window), and the pending-file list is broadcast —
    O(input files), the same bound the append cycle accepts.

    ``t_min``/``t_max`` must be ``width_s``-aligned so tier-bucket
    pruning and output buckets agree.
    """
    from pyspark.sql import functions as F

    from pyreshaper_spark.operators.rollup import (
        pick_tier,
        realtime_merge,
        rollup_cascade,
    )

    for b in (t_min, t_max):
        if b is not None and b % width_s:
            raise ValueError(f"t_min/t_max must be multiples of {width_s}")
    cat = get_catalog(cfg.output_path)
    names = {t.width_s: t.name for t in cfg.tiers}
    w = pick_tier(list(names), width_s)
    mat = rollup_cascade(
        read_tier(spark, cat, f"tier_{names[w]}", sources, t_min, t_max),
        width_s,
    )
    if not realtime:
        return mat

    from pyreshaper_spark.plans.pipeline import _load_input

    seq = _load_input(spark, cfg)
    if cat.exists("series_enc"):
        done = (
            cat.read(spark, "series_enc")
            .select(F.explode("input_files").alias("input_file"))
            .distinct()
        )
        seq = seq.join(F.broadcast(done), "input_file", "left_anti")
    if sources is not None:
        seq = seq.filter(F.col("source").isin(list(sources)))
    if t_min is not None:
        seq = seq.filter(F.col("event_s") >= t_min)
    if t_max is not None:
        seq = seq.filter(F.col("event_s") < t_max)
    return realtime_merge(mat, seq, width_s)


def read_tier(
    spark: SparkSession,
    cat: TableCatalog,
    table: str,
    sources: list[str] | None = None,
    t_min: int | None = None,
    t_max: int | None = None,
    snapshot_id: int | None = None,
):
    """Predicate-pushed read of a tier table — the dashboard-query face.

    ``sources`` prunes hive partitions from the MANIFEST (files of other
    sources are never opened); ``[t_min, t_max)`` skips files via the
    manifest's per-file bucket_s min/max stats (recorded at commit
    time, ``stats_cols=("bucket_s",)``). Both prunings happen at
    planning time against the snapshot log alone — at a 10^12-row
    deployment this turns "one source, last 6 hours" into a scan of a
    handful of files. The same predicates are re-applied row-level (a
    file can straddle the range boundary).
    """
    from pyspark.sql import functions as F

    pf = None
    if sources is not None:
        src_set = set(sources)
        pf = lambda p: p.get("source") in src_set  # noqa: E731

    sf = None
    if t_min is not None or t_max is not None:
        def sf(st: dict) -> bool:
            if "bucket_s" not in st:
                return True  # no stats → cannot prove a miss
            lo, hi = st["bucket_s"]
            if t_max is not None and int(lo) >= t_max:
                return False
            if t_min is not None and int(hi) < t_min:
                return False
            return True

    # Manifest pruning needs a snapshot log. On a manifest-less
    # binding (hivedir) skip the planning-time filters — they are pure
    # optimizations here, because the SAME predicates are re-applied
    # row-level below (and Spark still prunes hive partition dirs from
    # the .filter); a pinned-snapshot read still gates loudly.
    if "snapshots" in cat.capabilities():
        df = cat.read(
            spark, table, snapshot_id=snapshot_id,
            partition_filter=pf, stats_filter=sf, allow_empty=True,
        )
    else:
        df = cat.read(
            spark, table, snapshot_id=snapshot_id, allow_empty=True
        )
    if sources is not None:
        df = df.filter(F.col("source").isin(list(sources)))
    if t_min is not None:
        df = df.filter(F.col("bucket_s") >= t_min)
    if t_max is not None:
        df = df.filter(F.col("bucket_s") < t_max)
    return df
