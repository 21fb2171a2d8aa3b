"""Semantics pins for the forecast backtest, session coverage, and
quota-crossing operators (hand-built fixtures, exact expectations)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from pyreshaper_spark.operators.events import session_coverage
from pyreshaper_spark.operators.forecast import (
    forecast_accuracy,
    snaive_backtest,
)
from pyreshaper_spark.operators.rollup import quota_cross


def _tier(spark, rows):
    return spark.createDataFrame(
        rows, "source string, bucket_s long, sum_n_tok long"
    )


def test_snaive_gap_leaves_null_not_shift(spark):
    # buckets 0,10,30 (20 missing); season = 10.
    tier = _tier(spark, [("a", 0, 5), ("a", 10, 7), ("a", 30, 9)])
    out = {
        r["bucket_s"]: r
        for r in snaive_backtest(tier, season_s=10).collect()
    }
    # naive = previous OBSERVED bucket (gap-skipping row lag).
    assert out[0]["fc_naive"] is None
    assert out[10]["fc_naive"] == 5
    assert out[30]["fc_naive"] == 7 and out[30]["err_naive"] == 2
    # seasonal naive is bucket-KEYED: bucket 30 needs bucket 20, which
    # is a gap -> NULL, never "the previous row".
    assert out[10]["fc_snaive"] == 5 and out[10]["err_snaive"] == 2
    assert out[30]["fc_snaive"] is None and out[30]["err_snaive"] is None


def test_forecast_accuracy_both_methods_only(spark):
    tier = _tier(
        spark,
        [("a", 0, 5), ("a", 10, 7), ("a", 20, 4), ("a", 30, 9)],
    )
    # eval rows: buckets 10,20,30 have naive; snaive(10) also present
    # for all three (0,10,20 observed) -> n_eval=3.
    row = forecast_accuracy(tier, season_s=10).collect()[0]
    assert row["n_eval"] == 3
    assert row["sae_naive"] == abs(7 - 5) + abs(4 - 7) + abs(9 - 4)
    assert row["sae_snaive"] == abs(7 - 5) + abs(4 - 7) + abs(9 - 4)
    assert row["sum_abs_actual"] == 7 + 4 + 9


def _ev(spark, rows):
    # (event_id, ts_epoch, user_id) -> events-shaped frame
    data = [
        (i, dt.datetime.fromtimestamp(ep, dt.timezone.utc), u)
        for (i, ep, u) in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long"
    ).select("event_id", F.col("ts"), "user_id")


def test_session_coverage_clips_across_buckets(spark):
    # one user, one session spanning [3500, 3700]: 100 s in bucket 0,
    # 100 s in bucket 3600 (width 3600, gap default 1800).
    ev = _ev(spark, [(1, 3500, 1), (2, 3700, 1)])
    out = {r["bucket_s"]: r for r in session_coverage(ev, 3600).collect()}
    assert out[0]["covered_s"] == 100 and out[0]["n_sessions"] == 1
    assert out[3600]["covered_s"] == 100 and out[3600]["n_sessions"] == 1


def test_session_coverage_single_event_zero_length(spark):
    ev = _ev(spark, [(1, 100, 1), (2, 10_000, 1)])  # gap > 1800: 2 sessions
    out = {r["bucket_s"]: r for r in session_coverage(ev, 3600).collect()}
    assert out[0]["covered_s"] == 0 and out[0]["n_sessions"] == 1
    assert out[7200]["covered_s"] == 0 and out[7200]["n_sessions"] == 1


def test_quota_cross_first_bucket_only(spark):
    tier = _tier(
        spark,
        [
            ("a", 0, 3), ("a", 10, 4), ("a", 20, 5),   # cum 3,7,12
            ("b", 0, 1), ("b", 10, 2),                 # cum 1,3 - never
        ],
    )
    rows = quota_cross(tier, quota=7).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["source"] == "a"
    assert r["cross_bucket_s"] == 10 and r["cum_at_cross"] == 7


# --------------------------------------------------------------------------
# conformal prediction intervals
# --------------------------------------------------------------------------

def _one_source_tier(spark, vals):
    return spark.createDataFrame(
        [("s", i * 600, 1, v, v, v) for i, v in enumerate(vals)],
        "source string, bucket_s long, cnt long, sum_n_tok long, "
        "min_n_tok long, max_n_tok long",
    )


def test_conformal_hand_fixture(spark):
    from pyreshaper_spark.operators.forecast import conformal_interval

    # 11 buckets: split 4/5 → 8 calibration positions (7 residuals,
    # all = 10) → q̂ = 10; eval = positions 9-11
    vals = [0, 10, 0, 10, 0, 10, 0, 10, 5, 5, 100]
    out = sorted(
        conformal_interval(_one_source_tier(spark, vals)).collect(),
        key=lambda r: r["bucket_s"],
    )
    assert [r["qhat"] for r in out] == [10, 10, 10]
    assert [(r["actual"], r["fc"], r["covered"]) for r in out] == [
        (5, 10, True),    # |5-10| <= 10
        (5, 5, True),
        (100, 5, False),  # |100-5| > 10
    ]
    assert all(
        r["lo"] == r["fc"] - 10 and r["hi"] == r["fc"] + 10 for r in out
    )


def test_conformal_coverage_on_real_tier(spark, seq):
    from pyreshaper_spark.operators.forecast import conformal_interval
    from pyreshaper_spark.operators.rollup import rollup_tier0

    out = conformal_interval(rollup_tier0(seq, 600))
    rows = out.collect()
    assert rows
    # flag consistency: covered <=> |actual - fc| <= qhat
    for r in rows:
        assert r["qhat"] is not None  # every source has history here
        assert r["covered"] == (abs(r["actual"] - r["fc"]) <= r["qhat"])
        assert r["lo"] == r["fc"] - r["qhat"]
        assert r["hi"] == r["fc"] + r["qhat"]
    # conformal guarantee is >= 1 - alpha in expectation; allow slack
    # on one realization
    frac = sum(1 for r in rows if r["covered"]) / len(rows)
    assert frac >= 0.75


def test_conformal_short_history_kept_with_null_band(spark):
    """A 2-bucket source has no calibration residual: its evaluation
    row survives with a NULL band instead of silently vanishing."""
    from pyreshaper_spark.operators.forecast import conformal_interval

    out = conformal_interval(_one_source_tier(spark, [7, 9])).collect()
    assert len(out) == 1
    r = out[0]
    assert r["actual"] == 9 and r["fc"] == 7
    assert r["qhat"] is None and r["lo"] is None and r["covered"] is None


def test_conformal_rejects_bad_params(spark):
    import pytest

    from pyreshaper_spark.operators.forecast import conformal_interval

    t = _one_source_tier(spark, [1, 2, 3])
    with pytest.raises(ValueError):
        conformal_interval(t, alpha_num=0)
    with pytest.raises(ValueError):
        conformal_interval(t, split_num=5, split_den=5)
