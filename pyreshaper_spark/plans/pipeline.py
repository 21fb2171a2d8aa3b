"""End-to-end resumable rollup pipeline.

The graft analog of ``s2srun`` [U: scripts/s2srun → create_reshaper →
convert → print_diagnostics]: scan → validate → tier cascade → gap-fill
/ LOCF → salted transpose → Gorilla encode — every sink an IcebergLite
table commit, every step checkpointed AFTER its data commit, so a
re-run after any crash point either skips a committed step or redoes an
idempotent one (overwrite / chunk-anti-join append). That is the
reference's skip-existing write-mode generalized to snapshot semantics.

Output tables under ``cfg.output_path`` (IcebergLite root):

    tier_<name>          sparse continuous aggregate, partitioned by source
    tier_<name>_filled   gap-filled + LOCF version (non-raw tiers)
    meta_source          per-source metadata (the once-file analog)
    series_enc           Gorilla-encoded series chunks, one row per
                         (source, salt), partitioned by source
    metrics              per-chunk lineage rows (partition id, input
                         files, row counts, bytes, wall time)

Scale notes: the tier cascade reads tier *k* back from its committed
table (not the in-memory lineage), so a resumed run never recomputes
upstream tiers; the encode step's pending-work set is an anti-join of
input files against the LIVE series table's input-file lineage — the
file list is manifest-sized and broadcastable, the done-set is always
consistent with committed data (crash-idempotent), and append mode
encodes exactly the new files' rows.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyreshaper_spark.config import RunConfig
from pyreshaper_spark.operators.encode import encode_series_table
from pyreshaper_spark.operators.event_time import ensure_event_time
from pyreshaper_spark.operators.gapfill import gapfill_locf
from pyreshaper_spark.operators.rollup import (
    apply_retention,
    rollup_cascade,
    rollup_tier0,
)
from pyreshaper_spark.operators.transpose import (
    suggest_nsalt,
    transpose_to_series,
)
from pyreshaper_spark.operators.validate import validate_input
from pyreshaper_spark.plans.checkpoint import Checkpoint
from pyreshaper_spark.sources.iceberglite import IcebergLite

LINEAGE_COLS = (
    "source",
    "salt",
    "partition_id",
    "n",
    "raw_bytes",
    "enc_bytes",
    "wall_ms",
    "input_files",
)


@dataclass
class PipelineResult:
    snapshot_ids: dict[str, int]
    steps_run: list[str]
    steps_skipped: list[str]
    step_wall_s: dict[str, float] = None  # per-step driver wall time


def _load_input(spark: SparkSession, cfg: RunConfig) -> DataFrame:
    seq = spark.read.parquet(cfg.input_path)
    if "input_file" not in seq.columns:
        # captured at scan time (pre-shuffle) — the reference's
        # per-variable input-file accounting
        seq = seq.withColumn("input_file", F.input_file_name())
    return ensure_event_time(seq)


def run_pipeline(
    spark: SparkSession,
    cfg: RunConfig,
    checkpoint_path: str,
    stop_after: str | None = None,
) -> PipelineResult:
    """Run (or resume) the full pipeline.

    ``stop_after`` stops cleanly after the named step's commit +
    checkpoint save — the kill-and-resume test hook.
    """
    cfg.validate()
    cat = IcebergLite(cfg.output_path)
    if cfg.write_mode == "overwrite":
        # reference overwrite mode: ignore prior progress, redo every
        # step (tables get fresh snapshots; old ones stay time-travelable)
        ckpt = Checkpoint(attempt=Checkpoint.load(checkpoint_path).attempt)
    elif cfg.write_mode == "append":
        # incremental mode: EVERY step re-runs (tiers recompute over the
        # full, possibly-grown input — idempotent overwrites), while the
        # encode step appends only input files not yet in series_enc.
        # Keeping steps_done here made append a silent no-op (r1 advice).
        prior = Checkpoint.load(checkpoint_path)
        ckpt = Checkpoint(
            input_snapshot=prior.input_snapshot,
            chunks_done=prior.chunks_done,
            attempt=prior.attempt,
            nsalt=prior.nsalt,
        )
    else:  # "skip": resume — committed steps are skipped
        ckpt = Checkpoint.load(checkpoint_path)
    ckpt.attempt += 1
    ckpt.save(checkpoint_path)

    run, skipped = [], []
    snapshot_ids: dict[str, int] = {}
    step_wall: dict[str, float] = {}

    def commit_step(step: str, fn) -> bool:
        """Returns True if the caller should stop (stop_after hit)."""
        if ckpt.step_done(step):
            skipped.append(step)
            return False
        t0 = time.perf_counter()
        fn()
        step_wall[step] = round(time.perf_counter() - t0, 3)
        ckpt.mark_step(step)
        ckpt.save(checkpoint_path)  # always after the data commit
        run.append(step)
        return stop_after == step

    t0 = time.perf_counter()
    seq = _load_input(spark, cfg)
    if cfg.source_limit is not None:
        # the reference's convert(output_limit=N): cap the number of
        # series processed — deterministic first-N sources by name
        keep = [
            r["source"]
            for r in seq.select("source")
            .distinct()
            .orderBy("source")
            .limit(cfg.source_limit)
            .collect()
        ]
        seq = seq.filter(F.col("source").isin(keep))
    validate_input(seq)
    step_wall["validate"] = round(time.perf_counter() - t0, 3)

    # ---- once-file analog: per-source metadata, written once ----------
    def _meta():
        meta = seq.groupBy("source").agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tok"),
            F.min("event_s").alias("first_event_s"),
            F.max("event_s").alias("last_event_s"),
        )
        snapshot_ids["meta_source"] = cat.overwrite("meta_source", meta)

    if commit_step("meta_source", _meta):
        return PipelineResult(snapshot_ids, run, skipped, step_wall)

    # ---- tier cascade -------------------------------------------------
    prev_table: str | None = None
    for i, tier in enumerate(cfg.tiers):
        tname = f"tier_{tier.name}"

        def _tier(tier=tier, prev_table=prev_table, tname=tname):
            if prev_table is None:
                df = rollup_tier0(seq, tier.width_s)
            else:
                df = rollup_cascade(
                    cat.read(spark, prev_table), tier.width_s
                )
            if not cfg.meta_once:
                # metadata replication [U: reshaper.py :: convert
                # metadata write loop]: without once-file mode, the
                # per-source metadata rides on every tier row via a
                # broadcast join (meta is |sources| rows — always tiny)
                meta_cols = cat.read(spark, "meta_source").select(
                    "source",
                    F.col("n_docs").alias("src_n_docs"),
                    F.col("total_tok").alias("src_total_tok"),
                )
                df = df.join(F.broadcast(meta_cols), "source")
            snapshot_ids[tname] = cat.overwrite(
                tname, df, ("source",), stats_cols=("bucket_s",)
            )

        if commit_step(tname, _tier):
            return PipelineResult(snapshot_ids, run, skipped, step_wall)
        prev_table = tname

        if i > 0:  # gap-fill + LOCF for the coarser tiers
            fname = f"{tname}_filled"

            def _filled(tier=tier, tname=tname, fname=fname):
                filled = gapfill_locf(cat.read(spark, tname), tier.width_s)
                snapshot_ids[fname] = cat.overwrite(
                    fname, filled, ("source",), stats_cols=("bucket_s",)
                )

            if commit_step(fname, _filled):
                return PipelineResult(snapshot_ids, run, skipped, step_wall)

    # ---- retention enforcement ----------------------------------------
    # Runs AFTER the whole cascade so tier k+1 is always built from the
    # UN-pruned tier k (pruning first would corrupt coarse history);
    # each prune is its own idempotent commit (a new snapshot — the old
    # unpruned snapshot stays time-travel-readable).
    for tier in cfg.tiers:
        if tier.retention_buckets is None:
            continue
        rname = f"retention_{tier.name}"

        def _retention(tier=tier, rname=rname):
            tname = f"tier_{tier.name}"
            pruned = apply_retention(
                cat.read(spark, tname), tier.width_s, tier.retention_buckets
            )
            snapshot_ids[rname] = cat.overwrite(tname, pruned, ("source",))

        if commit_step(rname, _retention):
            return PipelineResult(snapshot_ids, run, skipped, step_wall)

    # ---- salted transpose + encode (file-incremental, resumable) ------
    def _encode():
        # nsalt pinned in the checkpoint on first resolution: a resume
        # or append with grown input (or cfg.nsalt=0 auto) must keep the
        # (source, salt) identities of already-committed chunks
        nsalt = ckpt.nsalt or cfg.nsalt or suggest_nsalt(seq)
        ckpt.nsalt = nsalt
        pending = seq
        resume = cfg.write_mode != "overwrite" and cat.exists("series_enc")
        if resume:
            # the done set is derived from the LIVE committed table's
            # input-file lineage, NOT the checkpoint: a crash between
            # the table commit and the checkpoint save then re-appends
            # nothing, and append mode picks up new rows wherever they
            # land — including inside an existing (source, salt) chunk
            # (they become additional chunk rows; decode and downstream
            # reads treat a series as a bag of chunk rows already)
            done_files = (
                cat.read(spark, "series_enc")
                .select(F.explode("input_files").alias("input_file"))
                .distinct()
            )
            pending = seq.join(
                F.broadcast(done_files), "input_file", "left_anti"
            )
        series = transpose_to_series(
            pending, nsalt, cfg.num_series_partitions,
            pack=True,
        )
        encoded = encode_series_table(series)
        # append ONLY when resuming past a committed table (its chunks
        # stay live); a fresh/overwrite run replaces the table —
        # appending here would duplicate every chunk
        # unpartitioned write: rows arrive source-clustered from the
        # encoder, a hive layout would churn one writer per source with
        # multi-MB cells (observed executor OOM at 40M rows); per-source
        # access instead uses manifest column stats (file skipping)
        wkw = dict(
            stats_cols=("source",),
            options={"parquet.block.size": 32 * 1024 * 1024},
        )
        sid = (
            cat.append("series_enc", encoded, **wkw)
            if resume
            else cat.overwrite("series_enc", encoded, **wkw)
        )
        snapshot_ids["series_enc"] = sid
        lineage = (
            cat.read(spark, "series_enc")
            .select(*LINEAGE_COLS)
            .withColumn("attempt", F.lit(ckpt.attempt))
            .withColumn("step", F.lit("encode"))
        )
        # metrics reflects the live chunk set exactly once per chunk
        snapshot_ids["metrics"] = cat.overwrite("metrics", lineage)
        chunks = [
            (r["source"], r["salt"])
            for r in cat.read(spark, "series_enc")
            .select("source", "salt")
            .distinct()
            .collect()
        ]
        ckpt.mark_chunks(chunks)

    if commit_step("encode", _encode):
        return PipelineResult(snapshot_ids, run, skipped, step_wall)

    # ---- optional port-fidelity gate (BASELINE.json:15) ---------------
    if cfg.verify_fidelity:

        def _verify():
            from pyreshaper_spark.operators.encode import decode_series_table

            dec = decode_series_table(cat.read(spark, "series_enc"))
            j = seq.alias("a").join(dec.alias("b"), "doc_id", "full_outer")
            bad = j.filter(
                F.col("a.tokens").isNull()
                | F.col("b.tokens").isNull()
                | (F.col("a.tokens") != F.col("b.tokens"))
                | (F.col("a.event_s") != F.col("b.event_s"))
            ).count()
            report = spark.createDataFrame(
                [(int(bad), int(ckpt.attempt))], "bad_rows long, attempt long"
            )
            snapshot_ids["fidelity"] = cat.overwrite("fidelity", report)
            if bad:
                raise RuntimeError(
                    f"fidelity invariant violated: {bad} rows differ after "
                    "decode (token arrays / event times)"
                )

        if commit_step("verify_fidelity", _verify):
            return PipelineResult(snapshot_ids, run, skipped, step_wall)

    return PipelineResult(snapshot_ids, run, skipped, step_wall)


def run_multi(
    spark: SparkSession,
    cfgs: list[RunConfig],
    checkpoint_dir: str,
) -> list[PipelineResult]:
    """Sequential multi-spec run — the ``MultiSpecReshaper`` analog
    [U: reshaper.py :: MultiSpecReshaper]: each RunConfig gets its own
    checkpoint file under ``checkpoint_dir`` and runs to completion
    (resumable individually)."""
    results = []
    for i, cfg in enumerate(cfgs):
        ck = os.path.join(checkpoint_dir, f"spec_{i}.json")
        results.append(run_pipeline(spark, cfg, ck))
    return results


def diagnostics(spark: SparkSession, cfg: RunConfig) -> DataFrame:
    """Global reduction + report [U: reshaper.py :: print_diagnostics]."""
    cat = IcebergLite(cfg.output_path)
    m = cat.read(spark, "metrics")
    return m.agg(
        F.sum("n").alias("points"),
        F.sum("raw_bytes").alias("raw_bytes"),
        F.sum("enc_bytes").alias("enc_bytes"),
        F.max("wall_ms").alias("max_chunk_wall_ms"),
        F.count("*").alias("chunks"),
    )
