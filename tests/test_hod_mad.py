"""hod_profile (time-of-day seasonality) + bucket_mad (exact integer
MAD) — semantics vs brute-force Python, including pre-epoch buckets."""

from __future__ import annotations

import pytest

from pyreshaper_spark.operators.rollup import bucket_mad, hod_profile


def test_hod_profile_folds_days(spark):
    # two days of 1h buckets, value = hour-of-day * 10 + day
    rows = [
        ("s0", day * 86400 + h * 3600, h * 10 + day)
        for day in (0, 1)
        for h in range(24)
    ]
    tier = spark.createDataFrame(
        rows, "source string, bucket_s long, sum_n_tok long"
    )
    got = {r["slot"]: r for r in hod_profile(tier, 3600).collect()}
    assert sorted(got) == list(range(24))
    for h in range(24):
        r = got[h]
        assert r["n_buckets"] == 2
        assert r["sum_v"] == (h * 10) + (h * 10 + 1)
        assert (r["min_v"], r["max_v"]) == (h * 10, h * 10 + 1)


def test_hod_profile_pre_epoch_slot_in_range(spark):
    # 1969-12-31 23:00 UTC = bucket -3600 → slot 23, not -1
    tier = spark.createDataFrame(
        [("s0", -3600, 7), ("s0", 0, 9)],
        "source string, bucket_s long, sum_n_tok long",
    )
    got = {r["slot"]: r["sum_v"] for r in hod_profile(tier, 3600).collect()}
    assert got == {23: 7, 0: 9}


def test_hod_profile_rejects_nondividing_width(spark):
    tier = spark.createDataFrame(
        [("s0", 0, 1)], "source string, bucket_s long, sum_n_tok long"
    )
    with pytest.raises(ValueError):
        hod_profile(tier, 7000)


def _mad_brute(vals: list[int]):
    vals = sorted(vals)
    n = len(vals)
    lo, hi = vals[(n + 1) // 2 - 1], vals[n // 2]
    devs = sorted(abs(2 * v - (lo + hi)) for v in vals)
    return lo, hi, devs[(n + 1) // 2 - 1], devs[n // 2]


@pytest.mark.parametrize(
    "vals",
    [
        [10, 20, 30, 40, 50, 1000],  # even count, one wild outlier
        [7, 7, 7, 7, 7],             # odd count, zero spread
        [3],                          # singleton
        [-5, -1, 0, 2],               # negatives
    ],
)
def test_bucket_mad_matches_bruteforce(spark, vals):
    tier = spark.createDataFrame(
        [("s0", 600 * i, v) for i, v in enumerate(vals)],
        "source string, bucket_s long, sum_n_tok long",
    )
    [r] = bucket_mad(tier, coarse_w=3600 * 24 * 365).collect()
    lo, hi, m2lo, m2hi = _mad_brute(vals)
    assert (r["n"], r["med_lo"], r["med_hi"]) == (len(vals), lo, hi)
    assert (r["mad2_lo"], r["mad2_hi"]) == (m2lo, m2hi)


def test_bucket_mad_outlier_robustness(spark):
    """The point of MAD: one wild fine bucket barely moves it, while
    it wrecks the mean."""
    vals = [100, 102, 98, 101, 99, 10_000]
    tier = spark.createDataFrame(
        [("s0", 600 * i, v) for i, v in enumerate(vals)],
        "source string, bucket_s long, sum_n_tok long",
    )
    [r] = bucket_mad(tier, coarse_w=86400).collect()
    # median midpoint = (100+101)/2 = 100.5 → med pair (100, 101)
    assert (r["med_lo"], r["med_hi"]) == (100, 101)
    # 2×MAD stays ~small despite the 10k outlier
    assert r["mad2_hi"] <= 6
