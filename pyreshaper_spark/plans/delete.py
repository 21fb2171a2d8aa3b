"""Targeted document deletion and restatement with incremental repair.

The mutation faces of the retention engine: :func:`delete_docs` is
"right to be forgotten" (remove a set of ``doc_id``s from EVERY data
product of a completed pipeline run); :func:`restate_docs` is the
upsert twin (the input rows for a set of ``doc_id``s were corrected in
place — payload, source, or event time — and every data product must
converge to a from-scratch run on the corrected input). Both repair
encoded series chunks, all tier / filled / analytic continuous
aggregates, per-source metadata, and lineage metrics — without
recomputing any of them from scratch.

Work is proportional to what the victims actually touched, never to
the corpus:

* **series_enc** — only the (source, salt) chunks that contained a
  victim are re-encoded (from the remaining raw rows of exactly those
  chunks: salt = ``pmod(xxhash64(doc_id), nsalt)`` is derivable from
  the victim list alone, using the checkpoint-pinned nsalt). The table
  commit is a single-snapshot copy-on-write
  :meth:`IcebergLite.replace_rows`: files that cannot hold an affected
  chunk (manifest ``source`` stats) are carried by reference.
* **tiers** — a victim at event time t invalidates exactly one bucket
  per tier width. Affected buckets at EVERY tier are re-aggregated
  from the remaining raw rows of those buckets only (never from a
  finer tier, whose live rows may be retention-pruned). Untouched
  buckets of affected sources ride along unchanged (modulo refreshed
  metadata replication columns); untouched sources keep their hive
  partitions (``overwrite_partitions``) — their files are not
  rewritten.
* **meta_source / metrics** — O(sources) / O(chunks) rebuilds.

At a 10^12-row deployment the raw-side reads here prune to the
affected sources' partitions and affected buckets' row groups (the
victim bucket list is a broadcast semi-join key set); nothing rescans
the historical corpus.

Retention interplay: repair never *adds* history — repaired buckets
are re-filtered against the live table's retention high-water mark, so
a bucket already aged out cannot be resurrected by a delete.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyreshaper_spark.config import RunConfig
from pyreshaper_spark.operators.encode import encode_series_table
from pyreshaper_spark.operators.rollup import (
    ANALYTIC_FAMILIES,
    floor_to,
    rollup_tier0,
)
from pyreshaper_spark.operators.transpose import (
    transpose_to_series,
    with_salt,
)
from pyreshaper_spark.plans.checkpoint import Checkpoint
from pyreshaper_spark.plans.pipeline import LINEAGE_COLS, _load_input
from pyreshaper_spark.sources.catalog import (
    TableCatalog,
    get_catalog,
    require_caps,
)


def _bucket(width_s: int) -> F.Column:
    return floor_to(F.col("event_s"), width_s).alias("bucket_s")


def victim_bucket_fix(
    rem_src: DataFrame, bad: DataFrame, tier0_fn, width_s: int
) -> DataFrame:
    """Recompute exactly the victim buckets of one tier from remaining
    raw rows: broadcast semi-join on (source, bucket) prunes the scan to
    the affected buckets, then tier0_fn re-aggregates at this tier's
    width. The repair walk uses this for EVERY tier (plan-gated in
    tools/plan_report.py §15)."""
    return tier0_fn(
        rem_src.withColumn("bucket_s", _bucket(width_s))
        .join(F.broadcast(bad), ["source", "bucket_s"], "left_semi")
        .drop("bucket_s"),
        width_s,
    )


def _resolve_ids(
    spark: SparkSession, doc_ids: Sequence[str] | DataFrame
) -> DataFrame:
    if isinstance(doc_ids, DataFrame):
        ids = doc_ids.select(F.col("doc_id").cast("string").alias("doc_id"))
    else:
        ids = spark.createDataFrame(
            [(str(d),) for d in doc_ids], "doc_id string"
        )
    return ids.distinct()


def _load_run(
    op: str, spark: SparkSession, cfg: RunConfig, checkpoint_path: str
) -> tuple[TableCatalog, Checkpoint, int]:
    cfg.validate()
    cat = get_catalog(cfg.output_path)
    # binding-time gate: the repair walk commits via replace_rows /
    # overwrite_partitions against pinned snapshot state
    require_caps(cat, {"mutation", "snapshots"}, op)
    ckpt = Checkpoint.load(checkpoint_path)
    if ckpt.cycle is not None:
        raise RuntimeError(
            f"{op}: an append cycle is in flight (checkpoint has "
            "pinned cycle state); finish or replay it first"
        )
    nsalt = ckpt.nsalt or cfg.nsalt
    if not nsalt:
        raise RuntimeError(
            f"{op}: no resolved nsalt (pipeline has not encoded yet)"
        )
    return cat, ckpt, nsalt


def delete_docs(
    spark: SparkSession,
    cfg: RunConfig,
    checkpoint_path: str,
    doc_ids: Sequence[str] | DataFrame,
) -> dict:
    """Delete ``doc_ids`` from every committed table of a finished
    pipeline run (see module docstring). Returns a report dict.

    ``doc_ids`` may be a Python sequence or a one-column ``doc_id``
    DataFrame. The victim list is assumed driver-manageable (a
    compliance batch, not a corpus) — it is broadcast into every probe.
    """
    cat, ckpt, nsalt = _load_run("delete_docs", spark, cfg, checkpoint_path)
    ids = _resolve_ids(spark, doc_ids)

    seq = _load_input(spark, cfg)
    victims = (
        with_salt(
            seq.join(F.broadcast(ids), "doc_id", "left_semi"), nsalt
        )
        .select("doc_id", "source", "salt", "event_s")
        .cache()
    )
    n_victims = victims.count()
    report: dict = {"deleted_rows": n_victims, "snapshot_ids": {}}
    if n_victims == 0:
        victims.unpersist()
        return report

    remaining = seq.join(F.broadcast(ids), "doc_id", "left_anti")
    _repair_run(spark, cfg, cat, ckpt, nsalt, victims, remaining, report)
    victims.unpersist()
    return report


def restate_docs(
    spark: SparkSession,
    cfg: RunConfig,
    checkpoint_path: str,
    doc_ids: Sequence[str] | DataFrame,
) -> dict:
    """Restatement — the upsert face of :func:`delete_docs`: the INPUT
    rows for ``doc_ids`` have been corrected in place (payload, source,
    or event time may all have changed; a doc may even be brand-new or
    gone entirely), and every committed table must be repaired to equal
    a from-scratch run on the current input — at incremental cost.

    The victim position set is the UNION of old and new placements:

    * **old** — recovered from the committed ``series_enc`` itself:
      chunks whose metadata ``doc_ids`` list (manifest-scale, no
      payload read) names a victim are decoded — O(victim chunks) —
      yielding the doc's previously-committed (source, event_s);
    * **new** — the victim rows of the current input.

    Both placements' (source, salt) chunks re-encode and both
    placements' time buckets re-aggregate, so a doc that MOVED between
    sources or buckets is removed where it was and added where it now
    belongs. Everything downstream is the shared repair walk of
    :func:`delete_docs` with ``current`` = the full corrected input.

    Interplay with :func:`delete_docs`: restatement treats the CURRENT
    INPUT as truth, so a doc previously deleted from the tables but
    still present in the input will be re-added wherever a restated
    doc shares its chunk or bucket. Compliance deletions must
    therefore also remove the rows from the input table (or be
    re-applied after a restatement touching their neighborhoods) —
    the same rule real Iceberg deployments follow when a table is
    rebuildable from upstream data.
    """
    cat, ckpt, nsalt = _load_run("restate_docs", spark, cfg, checkpoint_path)
    ids = _resolve_ids(spark, doc_ids)

    from pyreshaper_spark.operators.encode import decode_series_table

    seq = _load_input(spark, cfg)
    enc = cat.read(spark, "series_enc", allow_empty=True)
    old_chunks = (
        enc.select("source", "salt", F.explode("doc_ids").alias("doc_id"))
        .join(F.broadcast(ids), "doc_id", "left_semi")
        .select("source", "salt")
        .distinct()
    )
    old_rows = (
        decode_series_table(
            enc.join(F.broadcast(old_chunks), ["source", "salt"], "left_semi")
        )
        .join(F.broadcast(ids), "doc_id", "left_semi")
        .select("doc_id", "source", "event_s")
    )
    new_rows = seq.join(F.broadcast(ids), "doc_id", "left_semi").select(
        "doc_id", "source", "event_s"
    )
    victims = (
        with_salt(old_rows.unionByName(new_rows), nsalt)
        .select("doc_id", "source", "salt", "event_s")
        .distinct()
        .cache()
    )
    n_victims = victims.count()
    report: dict = {"restated_positions": n_victims, "snapshot_ids": {}}
    if n_victims == 0:
        victims.unpersist()
        return report

    _repair_run(spark, cfg, cat, ckpt, nsalt, victims, seq, report)
    victims.unpersist()
    return report


def _repair_run(
    spark: SparkSession,
    cfg: RunConfig,
    cat: TableCatalog,
    ckpt: Checkpoint,
    nsalt: int,
    victims: DataFrame,
    current: DataFrame,
    report: dict,
) -> None:
    """Shared incremental repair: given victim positions (doc_id,
    source, salt, event_s — every placement whose chunk/buckets are
    stale) and ``current`` (the full post-change input relation),
    re-encode exactly the victim chunks and re-aggregate exactly the
    victim buckets so every table equals a from-scratch run on
    ``current``."""
    remaining = current
    affected_sources = sorted(
        r[0] for r in victims.select("source").distinct().collect()
    )
    src_set = set(affected_sources)
    report["affected_sources"] = affected_sources

    # ---- series_enc: re-encode exactly the affected chunks ------------
    chunk_keys = victims.select("source", "salt").distinct()
    rem_chunks = (
        with_salt(remaining, nsalt)
        .join(F.broadcast(chunk_keys), ["source", "salt"], "left_semi")
        .drop("salt")
    )
    encoded = encode_series_table(
        transpose_to_series(
            rem_chunks, nsalt, cfg.num_series_partitions, pack=True
        )
    )
    smin, smax = affected_sources[0], affected_sources[-1]
    sid, rewritten, kept = cat.replace_rows(
        spark,
        "series_enc",
        keys=F.broadcast(chunk_keys),
        key_cols=("source", "salt"),
        replacement=encoded,
        # manifest column stats: skip files whose source range cannot
        # intersect the affected source set
        stats_filter=lambda st: (
            "source" not in st
            or (st["source"][0] <= smax and st["source"][1] >= smin)
        ),
        stats_cols=("source",),
        options={"parquet.block.size": 32 * 1024 * 1024},
    )
    report["snapshot_ids"]["series_enc"] = sid
    report["series_files_rewritten"] = rewritten
    report["series_files_untouched"] = kept

    # metrics mirrors the live chunk set (same rebuild as the pipeline)
    lineage = (
        cat.read(spark, "series_enc", allow_empty=True)
        .select(*LINEAGE_COLS)
        .withColumn("attempt", F.lit(ckpt.attempt))
        .withColumn("step", F.lit("delete"))
    )
    report["snapshot_ids"]["metrics"] = cat.overwrite("metrics", lineage)

    # ---- meta_source: recompute affected sources' rows ----------------
    meta_new = remaining.filter(F.col("source").isin(affected_sources)).groupBy(
        "source"
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tok"),
        F.min("event_s").alias("first_event_s"),
        F.max("event_s").alias("last_event_s"),
    )
    meta_keep = cat.read(spark, "meta_source", allow_empty=True).filter(
        ~F.col("source").isin(affected_sources)
    )
    meta = meta_keep.unionByName(meta_new)
    report["snapshot_ids"]["meta_source"] = cat.overwrite("meta_source", meta)

    # ---- tier cascade repair -------------------------------------------
    src_keys = F.broadcast(
        spark.createDataFrame([(s,) for s in affected_sources], "source string")
    )

    def _replace_sources(tname: str, out: DataFrame) -> int:
        """Atomically swap the affected sources' rows for ``out``
        (their full recomputed row set). Untouched sources' hive
        partitions are carried by reference; a source whose rows all
        vanished simply has no replacement rows — its partition is
        dropped in the same commit (the ``overwrite_partitions`` path
        would silently keep it)."""
        sid, _, _ = cat.replace_rows(
            spark,
            tname,
            keys=src_keys,
            key_cols=("source",),
            replacement=out,
            partition_filter=lambda p: p.get("source") in src_set,
            partition_by=("source",),
            # keep per-file bucket_s stats on the rewritten files so
            # read_tier's time-range pruning survives a repair commit
            stats_cols=("bucket_s",),
        )
        return sid

    def _repair_tables(tier0_fn, table_of, with_meta: bool) -> None:
        """Shared repair walk for the main tiers and each analytic
        family: fix EVERY tier's affected buckets directly from the
        remaining raw rows of those buckets (tier0_fn at that tier's
        width — exact at any width by aggregate associativity).

        Deliberately NOT a cascade from the repaired finer tier: if a
        finer tier has a retention policy, its live rows (and hence the
        repaired union) are pruned, and a coarse victim bucket whose
        fine buckets aged out would repair from partial data — the same
        divergence class the pipeline's append path guards against.
        Cost stays bounded by the victim buckets (partition filter +
        broadcast bucket semi-join prune the raw scan)."""
        rem_src = remaining.filter(F.col("source").isin(affected_sources))
        for tier in cfg.tiers:
            tname = table_of(tier)
            w = tier.width_s
            bad = victims.select("source", _bucket(w)).distinct()
            old = cat.read(
                spark,
                tname,
                partition_filter=lambda p: p.get("source") in src_set,
                # a retention-pruned tier may hold ZERO live rows for an
                # affected source — that's an empty repair base, not an
                # error
                allow_empty=True,
            )
            meta_cols = [c for c in old.columns if c.startswith("src_")]
            fixed = victim_bucket_fix(rem_src, bad, tier0_fn, w)
            untouched_buckets = old.drop(*meta_cols).join(
                F.broadcast(bad), ["source", "bucket_s"], "left_anti"
            )
            # the retention filter below applies only to what gets
            # WRITTEN; the filled tables build from the pre-filter union
            repaired = untouched_buckets.unionByName(fixed)
            written = repaired
            if tier.retention_buckets is not None:
                # never resurrect aged-out buckets: re-filter against the
                # live table's high-water mark
                hw = cat.read(
                    spark, tname, allow_empty=True
                ).agg(F.max("bucket_s")).collect()[
                    0
                ][0]
                if hw is not None:
                    # empty live table ⇒ no high-water mark, nothing
                    # can be resurrected — keep all repaired rows
                    written = repaired.filter(
                        F.col("bucket_s") > hw - tier.retention_buckets * w
                    )
            if with_meta and meta_cols:
                mc = cat.read(spark, "meta_source", allow_empty=True).select(
                    "source",
                    F.col("n_docs").alias("src_n_docs"),
                    F.col("total_tok").alias("src_total_tok"),
                )
                out = written.join(F.broadcast(mc), "source")
            else:
                out = written
            report["snapshot_ids"][tname] = _replace_sources(tname, out)

            fname = f"{tname}_filled"
            if cat.exists(fname):
                # pipeline ordering: filled tables are built from the
                # pre-retention tier (prune runs after the cascade)
                from pyreshaper_spark.operators.gapfill import gapfill_locf

                report["snapshot_ids"][fname] = _replace_sources(
                    fname, gapfill_locf(repaired, w)
                )

    _repair_tables(
        rollup_tier0,
        lambda t: f"tier_{t.name}",
        with_meta=not cfg.meta_once,
    )
    for fam in cfg.analytics:
        tier0_fn, _cascade_fn = ANALYTIC_FAMILIES[fam]
        _repair_tables(
            tier0_fn, lambda t, fam=fam: f"{fam}_{t.name}",
            with_meta=False,
        )

    # calendar tables rebuild in full from the just-repaired day-aligned
    # source tier (validated retention-free, so it IS the full truth;
    # the rebuild is O(that tier's rows), tiny next to the repair scan)
    if cfg.calendar:
        from pyreshaper_spark.operators.rollup import calendar_cascade

        cal_src = cat.read(
            spark, f"tier_{cfg.calendar_source_tier().name}",
            allow_empty=True,
        )
        for unit in cfg.calendar:
            cname = f"cal_{unit}"
            report["snapshot_ids"][cname] = cat.overwrite(
                cname, calendar_cascade(cal_src, unit), ("source",),
                stats_cols=("bucket_s",),
            )

    # ---- optional fidelity gate -----------------------------------------
    if cfg.verify_fidelity:
        from pyreshaper_spark.operators.encode import decode_series_table

        dec = decode_series_table(cat.read(spark, "series_enc", allow_empty=True))
        j = remaining.alias("a").join(dec.alias("b"), "doc_id", "full_outer")
        bad_rows = j.filter(
            F.col("a.tokens").isNull()
            | F.col("b.tokens").isNull()
            | (F.col("a.tokens") != F.col("b.tokens"))
            | (F.col("a.event_s") != F.col("b.event_s"))
        ).count()
        if bad_rows:
            raise RuntimeError(
                f"repair fidelity violated: {bad_rows} rows differ"
            )
        report["fidelity_checked"] = True


def refresh_from_changes(
    spark: SparkSession,
    cfg: RunConfig,
    checkpoint_path: str,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
) -> dict:
    """CDC-driven incremental refresh — the continuous-aggregate
    invalidation engine: the pipeline input lives in an IcebergLite
    table (``cfg.input_format == "iceberglite"``); given the input
    snapshot the tables were last built from, read the changelog
    (:meth:`IcebergLite.read_changes`), derive the set of doc_ids whose
    rows were inserted, deleted, or rewritten, and restate exactly
    those docs. Every data product converges to a from-scratch run on
    the current input at cost O(changed docs' chunks + buckets) — the
    TimescaleDB ``refresh_continuous_aggregate``-on-invalidation analog,
    built on the same snapshot/changelog substrate as the rest of the
    maintenance surface.

    Returns the :func:`restate_docs` report plus ``changed_docs`` (0 →
    no-op: an empty changelog never touches a table).
    """
    if cfg.input_format != "iceberglite":
        raise ValueError(
            "refresh_from_changes requires cfg.input_format='iceberglite' "
            f"(input must be a snapshot-versioned table), got "
            f"{cfg.input_format!r}"
        )
    # The restate must read EXACTLY the snapshot the changelog ends at,
    # or the tables converge to neither endpoint: a stale ::pin in
    # input_path would restate changed docs to their OLD content (and
    # treat post-pin inserts as deletions), while to_snapshot older than
    # the current snapshot would apply the 5→6 id set to snapshot-7
    # content. So resolve to_snapshot (default: current), reject a
    # conflicting pin, and pin the restate's input to that snapshot.
    parts = cfg.input_path.split("::")
    root, table = parts[0], parts[1]
    pin = int(parts[2]) if len(parts) > 2 and parts[2] else None
    cat_in = get_catalog(root)
    require_caps(
        cat_in, {"cdc", "snapshots"}, "refresh_from_changes(input)"
    )
    to_sid = (
        to_snapshot_id if to_snapshot_id is not None
        else cat_in.current_snapshot_id(table)
    )
    if pin is not None and pin != to_sid:
        raise ValueError(
            f"refresh_from_changes: input_path pins snapshot {pin} but the "
            f"refresh targets snapshot {to_sid} — drop the pin (or pin the "
            "refresh target) so the restate reads the snapshot the "
            "changelog ends at"
        )
    changes = cat_in.read_changes(spark, table, from_snapshot_id, to_sid)
    ids = changes.select(
        F.col("doc_id").cast("string").alias("doc_id")
    ).distinct()
    n_changed = ids.count()
    if n_changed == 0:
        return {"changed_docs": 0, "restated_positions": 0,
                "snapshot_ids": {}}
    cfg_at = dataclasses.replace(
        cfg, input_path=f"{root}::{table}::{to_sid}"
    )
    report = restate_docs(spark, cfg_at, checkpoint_path, ids)
    report["changed_docs"] = n_changed
    report["input_snapshot_id"] = to_sid
    return report
