"""ACF moments (correlate.autocorr_moments) vs numpy, and PromQL-style
histogram_quantile (rollup.histogram_quantile) exactness."""

from __future__ import annotations

import numpy as np
from fractions import Fraction

from pyreshaper_spark.operators.correlate import acf_finish, autocorr_moments
from pyreshaper_spark.operators.rollup import histogram_quantile


def test_acf_matches_numpy(spark):
    # dense series with a period-3 component → r peaks at lag 3w
    w = 600
    vals = [10, 3, 5, 11, 2, 6, 9, 4, 5, 12, 3, 7]
    rows = [("s", i * w, v) for i, v in enumerate(vals)]
    tier = spark.createDataFrame(
        rows, "source string, bucket_s long, sum_n_tok long"
    )
    lags = (w, 3 * w)
    m = autocorr_moments(tier, lags)
    got = {r["lag_s"]: r["acf_r"] for r in acf_finish(m).collect()}
    x = np.array(vals, dtype=float)
    for lag_mult, lag_s in ((1, w), (3, 3 * w)):
        a, b = x[:-lag_mult], x[lag_mult:]
        want = np.corrcoef(a, b)[0, 1]
        assert abs(got[lag_s] - want) < 1e-12
    assert got[3 * w] > got[w]  # the period shows


def test_acf_gap_alignment_is_bucket_keyed(spark):
    # a missing bucket must DROP pairs, not shift them
    rows = [("s", 0, 1), ("s", 600, 2), ("s", 1800, 4)]  # 1200 missing
    tier = spark.createDataFrame(
        rows, "source string, bucket_s long, sum_n_tok long"
    )
    m = {r["lag_s"]: r for r in autocorr_moments(tier, (600,)).collect()}
    # only (0,600) pairs at lag 600 — (600,1200) and (1200,1800) gone
    assert m[600]["n_buckets"] == 1
    assert int(m[600]["sxy"]) == 2


def test_histogram_quantile_exact(spark):
    # one bucket: bins 0:[cnt 2], 50:[cnt 6], 100:[cnt 2] → total 10
    hist = spark.createDataFrame(
        [("s", 0, 0, 2), ("s", 0, 50, 6), ("s", 0, 100, 2)],
        "source string, bucket_s long, bin_lo long, cnt long",
    )
    r = histogram_quantile(hist, bin_w=50, q_num=1, q_den=2).collect()[0]
    # median: rank 5 lands in bin 50 (cum_before 2): 50 + 50*(5-2)/6 = 75
    assert r["q_bin_lo"] == 50
    assert Fraction(r["hq_num"], r["hq_den"]) == Fraction(75)
    # p90: rank 9 → bin 50 holds ranks 3..8, so bin 100: 100+50*(9-8)/2
    r9 = histogram_quantile(hist, bin_w=50, q_num=9, q_den=10).collect()[0]
    assert r9["q_bin_lo"] == 100
    assert Fraction(r9["hq_num"], r9["hq_den"]) == Fraction(125)
    # q=1 → upper edge of the last occupied bin
    r1 = histogram_quantile(hist, bin_w=50, q_num=1, q_den=1).collect()[0]
    assert Fraction(r1["hq_num"], r1["hq_den"]) == Fraction(150)


def test_histogram_quantile_against_sorted_data(spark):
    """Interpolated quantile must land inside the true quantile's bin
    for every q, per (source, bucket)."""
    import itertools

    data = [7, 12, 12, 49, 50, 75, 99, 120, 130, 180, 201, 202]
    rows = []
    for v in data:
        rows.append(("s", 0, (v // 50) * 50))
    from collections import Counter

    hist = spark.createDataFrame(
        [("s", 0, b, c) for b, c in Counter(x[2] for x in rows).items()],
        "source string, bucket_s long, bin_lo long, cnt long",
    )
    for q_num, q_den in itertools.product((1, 2, 3, 9), (4, 10)):
        if q_num >= q_den:
            continue
        r = histogram_quantile(hist, 50, q_num, q_den).collect()[0]
        val = Fraction(r["hq_num"], r["hq_den"])
        # the classic rank statistic: ceil(q*n)-th smallest
        import math

        rank = math.ceil(q_num / q_den * len(data))
        true = sorted(data)[rank - 1]
        assert r["q_bin_lo"] <= val <= r["q_bin_lo"] + 50
        assert (true // 50) * 50 == r["q_bin_lo"], (q_num, q_den)


def test_histogram_quantile_property_random_multisets(spark):
    """Hypothesis sweep: on any multiset, the chosen bin is exactly the
    bin of the ceil(q·n)-th smallest value, and the interpolated value
    stays inside that bin — for several q."""
    import math

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    vals = st.lists(
        st.integers(min_value=0, max_value=499), min_size=1, max_size=60
    )

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(data=vals)
    def run(data):
        from collections import Counter

        bins = Counter((v // 50) * 50 for v in data)
        hist = spark.createDataFrame(
            [("s", 0, b, c) for b, c in bins.items()],
            "source string, bucket_s long, bin_lo long, cnt long",
        )
        srt = sorted(data)
        for q_num, q_den in ((1, 4), (1, 2), (9, 10), (1, 1)):
            r = histogram_quantile(hist, 50, q_num, q_den).collect()[0]
            rank = max(1, math.ceil(q_num / q_den * len(data)))
            true_bin = (srt[rank - 1] // 50) * 50
            assert r["q_bin_lo"] == true_bin, (data, q_num, q_den)
            val = Fraction(r["hq_num"], r["hq_den"])
            assert true_bin <= val <= true_bin + 50

    run()


def test_counter_rate_telescoping_property(spark):
    """On any series: sum(increase) telescopes — it equals
    last − first + (sum of pre-reset values' drops recovered), i.e.
    reconstructing the true total increase of a counter with restarts:
    Σ increase = Σ (v_i − v_{i−1} when monotone, else v_i)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyreshaper_spark.operators.gapfill import counter_rate

    series = st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=2, max_size=30
    )

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(vals=series)
    def run(vals):
        tier = spark.createDataFrame(
            [("s", i * 600, v) for i, v in enumerate(vals)],
            "source string, bucket_s long, sum_n_tok long",
        )
        rows = sorted(
            counter_rate(tier).collect(), key=lambda r: r["bucket_s"]
        )
        want = sum(
            v if v < p else v - p for p, v in zip(vals, vals[1:])
        )
        got = sum(r["increase"] for r in rows if r["increase"] is not None)
        assert got == want
        assert rows[0]["increase"] is None
        resets = [r["reset"] for r in rows[1:]]
        assert resets == [v < p for p, v in zip(vals, vals[1:])]

    run()
