"""Targeted document deletion (plans.delete.delete_docs): every table
of a completed run must equal a from-scratch run on the filtered input,
while untouched sources' files are carried by reference."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyreshaper_spark.config import RunConfig, TierSpec
from pyreshaper_spark.fixtures import sequences_df
from pyreshaper_spark.operators.encode import decode_series_table
from pyreshaper_spark.plans.delete import delete_docs
from pyreshaper_spark.plans.pipeline import run_pipeline
from pyreshaper_spark.sources.iceberglite import IcebergLite

SF = "/root/testdata/sf0.001"
TIERS = (TierSpec("1m", 60), TierSpec("10m", 600), TierSpec("1h", 3600))


def _cfg(inp, out, **kw):
    base = dict(
        input_path=inp, output_path=out, tiers=TIERS, nsalt=2,
        num_series_partitions=4, analytics=("ohlc",),
    )
    base.update(kw)
    return RunConfig(**base)


def _rows(df, drop=()):
    cols = sorted(c for c in df.columns if c not in drop)
    return sorted(
        tuple(str(r[c]) for c in cols) for r in df.select(*cols).collect()
    )


@pytest.fixture(scope="module")
def deleted_state(spark, tmp_path_factory):
    """Run pipeline on full input, delete victims, plus a reference
    pipeline run on the pre-filtered input."""
    root = tmp_path_factory.mktemp("del")
    seq = sequences_df(spark, SF)
    full_p = str(root / "seq_full")
    seq.write.parquet(full_p)

    # victims: a few docs from two sources + every doc of one source
    # (exercises the partition-drop path)
    srcs = sorted(r[0] for r in seq.select("source").distinct().collect())
    gone_src = srcs[0]
    some = [
        r["doc_id"]
        for r in seq.filter(F.col("source").isin(srcs[1], srcs[2]))
        .select("doc_id").orderBy("doc_id").limit(7).collect()
    ]
    all_of_src = [
        r["doc_id"]
        for r in seq.filter(F.col("source") == gone_src)
        .select("doc_id").collect()
    ]
    victims = some + all_of_src

    filt_p = str(root / "seq_filtered")
    seq.filter(~F.col("doc_id").isin(victims)).write.parquet(filt_p)

    cfg = _cfg(full_p, str(root / "out"), verify_fidelity=True)
    run_pipeline(spark, cfg, str(root / "ck.json"))
    cat = IcebergLite(cfg.output_path)
    files_before = {
        t: {f["path"] for f in cat._snapshot(t, None)["files"]}
        for t in ("tier_1m", "series_enc")
    }
    report = delete_docs(spark, cfg, str(root / "ck.json"), victims)

    ref_cfg = _cfg(filt_p, str(root / "ref_out"))
    run_pipeline(spark, ref_cfg, str(root / "ref_ck.json"))
    return {
        "cfg": cfg, "ref_cfg": ref_cfg, "report": report,
        "victims": victims, "gone_src": gone_src,
        "files_before": files_before,
    }


TABLES = (
    "tier_1m", "tier_10m", "tier_1h",
    "tier_10m_filled", "tier_1h_filled",
    "ohlc_1m", "ohlc_10m", "ohlc_1h",
    "meta_source",
)


@pytest.mark.parametrize("table", TABLES)
def test_tables_equal_fresh_run(spark, deleted_state, table):
    cat = IcebergLite(deleted_state["cfg"].output_path)
    ref = IcebergLite(deleted_state["ref_cfg"].output_path)
    assert _rows(cat.read(spark, table)) == _rows(ref.read(spark, table))


def test_series_decode_equals_fresh_run(spark, deleted_state):
    cat = IcebergLite(deleted_state["cfg"].output_path)
    ref = IcebergLite(deleted_state["ref_cfg"].output_path)
    got = decode_series_table(cat.read(spark, "series_enc"))
    want = decode_series_table(ref.read(spark, "series_enc"))
    assert _rows(got) == _rows(want)


def test_victims_are_gone_everywhere(spark, deleted_state):
    cat = IcebergLite(deleted_state["cfg"].output_path)
    victims = set(deleted_state["victims"])
    dec = decode_series_table(cat.read(spark, "series_enc"))
    assert dec.filter(F.col("doc_id").isin(list(victims))).count() == 0
    gone = deleted_state["gone_src"]
    for t in ("tier_1m", "tier_1h_filled", "ohlc_1h", "meta_source"):
        assert (
            cat.read(spark, t).filter(F.col("source") == gone).count() == 0
        ), t
    # the emptied source's hive partition is dropped from the manifest
    assert not any(
        f["partition"].get("source") == gone
        for f in cat._snapshot("tier_1m", None)["files"]
    )


def test_untouched_files_carried_by_reference(spark, deleted_state):
    """Copy-on-write: files of unaffected sources survive as the SAME
    manifest entries — no rewrite."""
    cat = IcebergLite(deleted_state["cfg"].output_path)
    report = deleted_state["report"]
    affected = set(report["affected_sources"])
    before = deleted_state["files_before"]["tier_1m"]
    after = {f["path"] for f in cat._snapshot("tier_1m", None)["files"]}
    untouched_before = {
        p for p in before
        if not any(f"source={s}/" in p for s in affected)
    }
    assert untouched_before and untouched_before <= after
    assert report["series_files_untouched"] >= 0
    # affected-source tier files were replaced
    assert not any(
        f"source={next(iter(affected))}/" in p for p in after & before
    ) or deleted_state["gone_src"] not in affected


def test_metrics_reflect_live_chunks(spark, deleted_state):
    cat = IcebergLite(deleted_state["cfg"].output_path)
    m = cat.read(spark, "metrics")
    enc = cat.read(spark, "series_enc")
    assert _rows(
        m.select("source", "salt", "n")
    ) == _rows(enc.select("source", "salt", "n"))
    # lineage totals still reproduce the remaining corpus exactly
    total = (
        m.agg(F.sum("n")).collect()[0][0] or 0
    )
    ref = IcebergLite(deleted_state["ref_cfg"].output_path)
    want = ref.read(spark, "metrics").agg(F.sum("n")).collect()[0][0]
    assert total == want


def test_delete_nothing_is_noop(spark, tmp_path):
    seq = sequences_df(spark, SF).limit(200)
    p = str(tmp_path / "seq")
    seq.write.parquet(p)
    cfg = _cfg(p, str(tmp_path / "out"), analytics=())
    run_pipeline(spark, cfg, str(tmp_path / "ck.json"))
    cat = IcebergLite(cfg.output_path)
    before = cat.current_snapshot_id("series_enc")
    report = delete_docs(
        spark, cfg, str(tmp_path / "ck.json"), ["no-such-doc"]
    )
    assert report["deleted_rows"] == 0
    assert cat.current_snapshot_id("series_enc") == before


def test_delete_refuses_midcycle(spark, tmp_path):
    seq = sequences_df(spark, SF).limit(100)
    p = str(tmp_path / "seq")
    seq.write.parquet(p)
    cfg = _cfg(p, str(tmp_path / "out"), analytics=())
    ck = str(tmp_path / "ck.json")
    run_pipeline(spark, cfg, ck)
    from pyreshaper_spark.plans.checkpoint import Checkpoint

    c = Checkpoint.load(ck)
    c.cycle = {"bases": {}, "pending": []}
    c.save(ck)
    with pytest.raises(RuntimeError, match="append cycle"):
        delete_docs(spark, cfg, ck, ["0"])


def test_delete_with_retention_on_fine_tier_repairs_coarse_from_raw(
    spark, tmp_path
):
    """A finer tier with a retention policy is pruned; a delete touching
    a coarse bucket whose fine buckets aged out must still repair that
    coarse bucket correctly (from raw remaining rows, never from the
    pruned finer tier). Every tier must equal a from-scratch run with
    the same retention config on the filtered input."""
    seq = sequences_df(spark, SF)
    full_p = str(tmp_path / "seq_full")
    seq.write.parquet(full_p)
    tiers = (
        TierSpec("1m", 60, retention_buckets=30),
        TierSpec("10m", 600),
    )
    cfg = _cfg(full_p, str(tmp_path / "out"), tiers=tiers, analytics=())
    run_pipeline(spark, cfg, str(tmp_path / "ck.json"))

    # victims: oldest docs of one source — their 1m buckets are already
    # aged out of the pruned fine tier, but their 10m buckets live on
    src = sorted(r[0] for r in seq.select("source").distinct().collect())[1]
    victims = [
        r["doc_id"]
        for r in seq.filter(F.col("source") == src)
        .orderBy("event_s").limit(5).collect()
    ]
    delete_docs(spark, cfg, str(tmp_path / "ck.json"), victims)

    filt_p = str(tmp_path / "seq_filt")
    seq.filter(~F.col("doc_id").isin(victims)).write.parquet(filt_p)
    ref_cfg = _cfg(
        filt_p, str(tmp_path / "ref_out"), tiers=tiers, analytics=()
    )
    run_pipeline(spark, ref_cfg, str(tmp_path / "ref_ck.json"))

    cat, ref = IcebergLite(cfg.output_path), IcebergLite(ref_cfg.output_path)
    for t in ("tier_1m", "tier_10m", "tier_10m_filled"):
        assert _rows(cat.read(spark, t)) == _rows(ref.read(spark, t)), t
