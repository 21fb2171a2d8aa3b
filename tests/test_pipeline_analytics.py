"""Pipeline analytic aggregate families (RunConfig.analytics):
fresh-run parity with the direct operators, resume skipping, and exact
append-cycle merge."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyreshaper_spark.config import RunConfig, TierSpec
from pyreshaper_spark.fixtures import sequences_df
from pyreshaper_spark.operators.rollup import (
    m4_finish,
    ndv_sketch_finish,
    ndv_sketch_tier0,
    ohlc_finish,
    rollup_m4,
    rollup_ohlc,
)
from pyreshaper_spark.plans.pipeline import run_pipeline
from pyreshaper_spark.sources.iceberglite import IcebergLite

SF = "/root/testdata/sf0.001"
TIERS = (TierSpec("1m", 60), TierSpec("10m", 600), TierSpec("1h", 3600))
FAMS = ("ohlc", "m4", "ndv_sketch", "hist50")


@pytest.fixture(scope="module")
def seq_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("aseq") / "sequences")
    sequences_df(spark, SF).write.parquet(p)
    return p


def _set(df):
    return {tuple(str(v) for v in r) for r in df.collect()}


def test_analytics_tables_match_direct_operators(spark, seq_path, tmp_path):
    cfg = RunConfig(
        input_path=seq_path, output_path=str(tmp_path / "out"),
        tiers=TIERS, nsalt=2, num_series_partitions=4, analytics=FAMS,
    )
    res = run_pipeline(spark, cfg, str(tmp_path / "ck.json"))
    for fam in FAMS:
        for t in TIERS:
            assert f"{fam}_{t.name}" in res.steps_run
    cat = IcebergLite(cfg.output_path)
    seq = sequences_df(spark, SF)

    got = ohlc_finish(
        cat.read(spark, "ohlc_1h").select(
            "source", "bucket_s", "o_key", "c_key", "lo", "hi"
        )
    )
    assert _set(got) == _set(ohlc_finish(rollup_ohlc(seq, 3600)))

    got_m4 = m4_finish(
        cat.read(spark, "m4_1h").select(
            "source", "bucket_s",
            "first_key", "last_key", "bottom_key", "top_key",
        )
    )
    assert _set(got_m4) == _set(m4_finish(rollup_m4(seq, 3600)))

    got_sk = ndv_sketch_finish(
        cat.read(spark, "ndv_sketch_1h").select(
            "source", "bucket_s", "cnt", "ndv_sk"
        )
    )
    assert _set(got_sk) == _set(
        ndv_sketch_finish(ndv_sketch_tier0(seq, 3600))
    )

    # resume run skips every family step
    res2 = run_pipeline(spark, cfg, str(tmp_path / "ck.json"))
    assert not res2.steps_run
    for fam in FAMS:
        assert f"{fam}_1h" in res2.steps_skipped


def test_analytics_append_merge_is_exact(spark, tmp_path):
    """Two append cycles over a split input must produce byte-identical
    family tables to one full recompute — the associative-merge claim."""
    seq = sequences_df(spark, SF)
    part = F.abs(F.xxhash64(F.col("doc_id").cast("string"))) % 2
    p = str(tmp_path / "inc_seq")
    seq.filter(part == 0).write.parquet(p)
    cfg = RunConfig(
        input_path=p, output_path=str(tmp_path / "out"),
        tiers=TIERS, nsalt=2, num_series_partitions=4,
        write_mode="append", analytics=("ohlc", "ndv_sketch"),
    )
    ck = str(tmp_path / "ck.json")
    run_pipeline(spark, cfg, ck)
    seq.filter(part == 1).write.mode("append").parquet(p)
    second = run_pipeline(spark, cfg, ck)
    assert "ohlc_1m" in second.steps_run  # append re-runs family steps

    cat = IcebergLite(cfg.output_path)
    got = ohlc_finish(
        cat.read(spark, "ohlc_1h").select(
            "source", "bucket_s", "o_key", "c_key", "lo", "hi"
        )
    )
    assert _set(got) == _set(ohlc_finish(rollup_ohlc(seq, 3600)))
    got_sk = ndv_sketch_finish(
        cat.read(spark, "ndv_sketch_1h").select(
            "source", "bucket_s", "cnt", "ndv_sk"
        )
    )
    assert _set(got_sk) == _set(
        ndv_sketch_finish(ndv_sketch_tier0(seq, 3600))
    )


def test_bad_family_name_rejected(tmp_path):
    with pytest.raises(ValueError, match="unknown analytics"):
        RunConfig(
            input_path="x", output_path=str(tmp_path), tiers=TIERS,
            analytics=("nope",),
        ).validate()


def test_moments_family_cascade_and_append_merge(spark, seq_path, tmp_path):
    """'moments' as a pipeline analytic family: fresh-run tables equal
    the direct operator at every tier (cascade exactness of power sums),
    and a two-cycle append run converges to the same tables."""
    from pyreshaper_spark.operators.rollup import bucket_moments

    seq = sequences_df(spark, SF)
    cfg = RunConfig(
        input_path=seq_path, output_path=str(tmp_path / "out"),
        tiers=TIERS, nsalt=2, num_series_partitions=4,
        analytics=("moments",),
    )
    run_pipeline(spark, cfg, str(tmp_path / "ck.json"))
    cat = IcebergLite(cfg.output_path)
    cols = ["source", "bucket_s", "n", "s1", "s2", "s3", "s4"]
    for t in TIERS:
        got = _set(cat.read(spark, f"moments_{t.name}").select(*cols))
        want = _set(bucket_moments(seq, t.width_s).select(*cols))
        assert got == want, t.name

    # append: half the files first, the rest in cycle 2
    part = F.abs(F.xxhash64(F.col("doc_id").cast("string"))) % 2
    p = str(tmp_path / "inc")
    seq.filter(part == 0).write.parquet(p)
    cfg2 = RunConfig(
        input_path=p, output_path=str(tmp_path / "out2"),
        tiers=TIERS, nsalt=2, num_series_partitions=4,
        analytics=("moments",), write_mode="append",
    )
    ck2 = str(tmp_path / "ck2.json")
    run_pipeline(spark, cfg2, ck2)
    seq.filter(part == 1).write.mode("append").parquet(p)
    run_pipeline(spark, cfg2, ck2)
    cat2 = IcebergLite(cfg2.output_path)
    for t in TIERS:
        got = _set(cat2.read(spark, f"moments_{t.name}").select(*cols))
        want = _set(bucket_moments(seq, t.width_s).select(*cols))
        assert got == want, f"append {t.name}"


def test_calendar_tables_fresh_append_and_repair(spark, tmp_path):
    """cal_<unit> pipeline tables: fresh run equals the direct calendar
    rollup from raw; a two-cycle append converges to from-scratch; a
    compliance delete repairs them to the from-scratch result."""
    from pyreshaper_spark.operators.rollup import calendar_rollup
    from pyreshaper_spark.plans.delete import delete_docs

    seq = sequences_df(spark, SF)
    part = F.abs(F.xxhash64(F.col("doc_id").cast("string"))) % 2
    p = str(tmp_path / "cal_seq")
    seq.filter(part == 0).write.parquet(p)
    cfg = RunConfig(
        input_path=p, output_path=str(tmp_path / "out"),
        tiers=TIERS, nsalt=2, num_series_partitions=4,
        write_mode="append", calendar=("week", "month"),
    )
    ck = str(tmp_path / "ck.json")
    first = run_pipeline(spark, cfg, ck)
    assert "cal_week" in first.steps_run and "cal_month" in first.steps_run
    cat = IcebergLite(cfg.output_path)
    half = seq.filter(part == 0)
    cols = ["source", "bucket_s", "cnt", "sum_n_tok",
            "min_n_tok", "max_n_tok"]

    def _cal(name):
        return _set(cat.read(spark, name).select(*cols))

    assert _cal("cal_week") == _set(
        calendar_rollup(half, "week").select(*cols)
    )
    # second cycle: full input
    seq.filter(part == 1).write.mode("append").parquet(p)
    second = run_pipeline(spark, cfg, ck)
    assert "cal_month" in second.steps_run
    for unit in ("week", "month"):
        assert _cal(f"cal_{unit}") == _set(
            calendar_rollup(seq, unit).select(*cols)
        )
    # compliance delete: calendar tables converge to the remaining rows
    victims = [r["doc_id"] for r in seq.limit(5).collect()]
    delete_docs(spark, cfg, ck, victims)
    remaining = seq.filter(~F.col("doc_id").isin(victims))
    for unit in ("week", "month"):
        assert _cal(f"cal_{unit}") == _set(
            calendar_rollup(remaining, unit).select(*cols)
        )


def test_calendar_config_rejections(tmp_path):
    with pytest.raises(ValueError, match="unknown calendar"):
        RunConfig(input_path="x", output_path=str(tmp_path),
                  tiers=TIERS, calendar=("fortnight",)).validate()
    # no day-aligned tier: widths must divide 86400
    with pytest.raises(ValueError, match="day-aligned"):
        RunConfig(input_path="x", output_path=str(tmp_path),
                  tiers=(TierSpec("7h", 25200),),
                  calendar=("month",)).validate()
    # retention on the day-aligned source tier is rejected
    with pytest.raises(ValueError, match="retention"):
        RunConfig(
            input_path="x", output_path=str(tmp_path),
            tiers=(TierSpec("1m", 60),
                   TierSpec("1h", 3600, retention_buckets=24)),
            calendar=("month",),
        ).validate()
