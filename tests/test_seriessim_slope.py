"""Unit tests for day_profile_knn, rolling_slope, vocab_jaccard and
quality_pctl — reference-computed expectations on tiny hand-built
inputs, plus the properties the operators promise."""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import Row

from pyreshaper_spark.operators.gapfill import rolling_slope
from pyreshaper_spark.operators.seriessim import day_profile_knn
from pyreshaper_spark.operators.vocab import vocab_jaccard


def _tier(spark, rows):
    return spark.createDataFrame(
        [Row(source=s, bucket_s=b, sum_n_tok=v) for s, b, v in rows]
    )


# --------------------------------------------------------------- knn


def test_day_profile_knn_exact_distance(spark):
    # day 0: [10, 20]; day 1: [10, 20]; day 2: [100, 0 (missing)]
    rows = [
        ("a", 0, 10), ("a", 3600, 20),
        ("a", 86400, 10), ("a", 90000, 20),
        ("a", 172800, 100),
    ]
    out = day_profile_knn(_tier(spark, rows), k=2)
    got = {
        (r.day_s, r.nbr_day_s): (int(r.d2), r.rank)
        for r in out.collect()
    }
    # d(day0, day1) = 0; d(day0, day2) = (10-100)^2 + 20^2 = 8500
    assert got[(0, 86400)] == (0, 1)
    assert got[(0, 172800)] == (8100 + 400, 2)
    assert got[(86400, 0)] == (0, 1)
    # day2's nearest is tied 8500 for both → tie on day ascending
    assert got[(172800, 0)] == (8500, 1)
    assert got[(172800, 86400)] == (8500, 2)


def test_day_profile_knn_no_shared_slots(spark):
    # Two days with disjoint slots: distance = ||a||^2 + ||b||^2.
    rows = [("a", 0, 3), ("a", 86400 + 3600, 4)]
    out = day_profile_knn(_tier(spark, rows), k=1).collect()
    assert {int(r.d2) for r in out} == {25}
    assert len(out) == 2  # both directions ranked


def test_day_profile_knn_sources_isolated(spark):
    rows = [("a", 0, 1), ("b", 86400, 1)]
    assert day_profile_knn(_tier(spark, rows), k=3).count() == 0


# ------------------------------------------------------------- slope


def _ols_slope(ys):
    k = len(ys)
    ps = range(k)
    num = k * sum(p * y for p, y in zip(ps, ys)) - sum(ps) * sum(ys)
    den = k * sum(p * p for p in ps) - sum(ps) ** 2
    return num, den


def test_rolling_slope_matches_reference(spark):
    vals = [5, 7, 4, 9, 12, 10, 15, 14]
    rows = [("a", 600 * i, v) for i, v in enumerate(vals)]
    out = rolling_slope(_tier(spark, rows), k=4)
    got = {r.bucket_s: (r.slope_num, r.slope_den) for r in out.collect()}
    assert len(got) == len(vals)
    for i in range(len(vals)):
        num, den = got[600 * i]
        if i < 3:
            assert num is None
        else:
            window = vals[i - 3 : i + 1]
            rnum, rden = _ols_slope(window)
            assert den == rden
            assert Fraction(num, den) == Fraction(rnum, rden)


def test_rolling_slope_rising_positive(spark):
    rows = [("a", 60 * i, 10 * i) for i in range(6)]
    out = rolling_slope(_tier(spark, rows), k=6).collect()
    last = [r for r in out if r.bucket_s == 300][0]
    assert last.slope_num > 0
    # exactly linear: slope = 10 per step
    assert Fraction(last.slope_num, last.slope_den) == 10


# ----------------------------------------------------------- jaccard


def test_vocab_jaccard_exact(spark):
    tok = spark.createDataFrame(
        [
            Row(source="a", event_s=0, token=t)
            for t in [1, 1, 2, 3]
        ]
        + [Row(source="b", event_s=0, token=t) for t in [2, 3, 4]]
        + [Row(source="c", event_s=0, token=t) for t in [9]]
    )
    out = {
        (r.source_a, r.source_b): (r.v_a, r.v_b, r.inter, r.jacc_ppb)
        for r in vocab_jaccard(tok).collect()
    }
    # a={1,2,3}, b={2,3,4}: inter 2, union 4 → 0.5
    assert out[("a", "b")] == (3, 3, 2, 500_000_000)
    # disjoint pairs still appear with inter 0
    assert out[("a", "c")] == (3, 1, 0, 0)
    assert out[("b", "c")] == (3, 1, 0, 0)


# ------------------------------------------------------------- pctl


def test_quality_pctl_bounds_and_order(spark):
    from pyreshaper_spark.operators.sampling import quality_pctl

    docs = spark.createDataFrame(
        [
            Row(doc_id="d1", source="a", text="x x x x"),
            Row(doc_id="d2", source="a", text="a b c d"),
            Row(doc_id="d3", source="a", text="a a b b"),
            Row(doc_id="d4", source="b", text="only one doc here"),
        ]
    )
    out = {r.doc_id: r for r in quality_pctl(docs).collect()}
    # scores: d1 = 1*1000//4 = 250, d2 = 1000, d3 = 500
    assert out["d1"].score == 250
    assert out["d2"].score == 1000
    assert out["d3"].score == 500
    # permille: rank order d1 < d3 < d2 → 0, 500, 1000
    assert out["d1"].pctl_permille == 0
    assert out["d3"].pctl_permille == 500
    assert out["d2"].pctl_permille == 1000
    # single-doc source pins to 0
    assert out["d4"].pctl_permille == 0


def test_quality_pctl_skips_empty(spark):
    from pyreshaper_spark.operators.sampling import quality_pctl

    docs = spark.createDataFrame(
        [Row(doc_id="d1", source="a", text="")]
    )
    # the splitter yields [''] for '' (len 1, non-empty words col is
    # implementation-defined) — just assert no crash and permille in
    # range for whatever survives
    rows = quality_pctl(docs).collect()
    for r in rows:
        assert 0 <= r.pctl_permille <= 1000


# -------------------------------------------------------------- holt


def _holt_ref(vals, k):
    """Fraction reference of the truncated Holt backtest."""
    out = []
    for t in range(len(vals)):
        if t < k:
            out.append(None)
            continue
        l_num = sum((1 << (k - i)) * vals[t - i] for i in range(1, k + 1))
        d_num = sum(
            (1 << (k - 1 - j)) * (vals[t - j] - vals[t - j - 1])
            for j in range(1, k)
        )
        l_den = (1 << k) - 1
        d_den = (1 << (k - 1)) - 1
        out.append((l_num * d_den + d_num * l_den, l_den * d_den))
    return out


def test_holt_backtest_matches_reference(spark):
    import random

    rnd = random.Random(11)
    vals = [rnd.randrange(0, 10_000) for _ in range(20)]
    rows = [("a", 600 * i, v) for i, v in enumerate(vals)]
    from pyreshaper_spark.operators.forecast import holt_backtest

    out = {
        r.bucket_s: (r.fc_num, r.fc_den, r.err_scaled)
        for r in holt_backtest(_tier(spark, rows), k=6).collect()
    }
    ref = _holt_ref(vals, 6)
    for i, r in enumerate(ref):
        num, den, err = out[600 * i]
        if r is None:
            assert num is None and err is None
        else:
            assert (num, den) == r
            assert err == abs(vals[i] * r[1] - r[0])


def test_holt_beats_naive_on_trend(spark):
    # strongly trending series: Holt error < naive error
    vals = [100 * i for i in range(30)]
    rows = [("a", 600 * i, v) for i, v in enumerate(vals)]
    from pyreshaper_spark.operators.forecast import holt_backtest

    rows_out = holt_backtest(_tier(spark, rows), k=6).collect()
    scored = [r for r in rows_out if r.err_scaled is not None]
    assert scored
    for r in scored:
        naive_err_scaled = abs(
            r.actual - (r.actual - 100)
        ) * r.fc_den  # naive = previous value
        assert r.err_scaled < naive_err_scaled


# --------------------------------------------------------------- eta


def test_eta_threshold_exact(spark):
    from pyreshaper_spark.operators.rollup import eta_threshold

    # one day, 4 hourly points rising 10, 20, 30, 40 → slope 10/bucket
    rows = [("a", 3600 * i, 10 * (i + 1)) for i in range(4)]
    out = eta_threshold(
        _tier(spark, rows), coarse_s=86400, fine_s=3600, threshold=100
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.v_last == 40 and r.will_cross == 1
    # slope = 10 per fine bucket → (100-40)/10 * 3600 s = 21600 s
    assert r.eta_s_num / r.slope_num == 6 * 3600
    # receding series: will_cross = 0, row retained
    rows2 = [("a", 3600 * i, 100 - 10 * i) for i in range(4)]
    r2 = eta_threshold(
        _tier(spark, rows2), coarse_s=86400, fine_s=3600, threshold=200
    ).collect()[0]
    assert r2.will_cross == 0


def test_fertility_exact(spark):
    from pyreshaper_spark.operators.text import fertility_by_source

    docs = spark.createDataFrame(
        [
            Row(doc_id="1", source="a", text="ab cd"),  # 5 chars, 2 tok
            Row(doc_id="2", source="a", text="efg"),    # 3 chars, 1 tok
        ]
    )
    r = fertility_by_source(docs).collect()[0]
    assert (r.n_docs, r.sum_chars, r.sum_tok) == (2, 8, 3)
    assert r.chars_per_tok_ppm == 8 * 1_000_000 // 3


def test_day_profile_knn_fuzz_vs_bruteforce(spark):
    """Randomized sparse day profiles: ranks and exact distances must
    match a dict-based brute-force reference (missing slots = 0)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyreshaper_spark.operators.seriessim import day_profile_knn

    cells = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # day
            st.integers(min_value=0, max_value=5),   # slot (hour)
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda t: (t[0], t[1]),
    )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(data=cells)
    def run(data):
        rows = [
            ("s", d * 86400 + h * 3600, v) for d, h, v in data
        ]
        got = {}
        for r in day_profile_knn(_tier(spark, rows), k=2).collect():
            got.setdefault(r.day_s // 86400, []).append(
                (r.rank, r.nbr_day_s // 86400, int(r.d2))
            )
        days = sorted({d for d, _, _ in data})
        prof = {d: {} for d in days}
        for d, h, v in data:
            prof[d][h] = v
        for d in days:
            cands = []
            for o in days:
                if o == d:
                    continue
                slots = set(prof[d]) | set(prof[o])
                d2 = sum(
                    (prof[d].get(s2, 0) - prof[o].get(s2, 0)) ** 2
                    for s2 in slots
                )
                cands.append((d2, o))
            cands.sort()
            expect = [
                (i + 1, o, d2) for i, (d2, o) in enumerate(cands[:2])
            ]
            assert sorted(got.get(d, [])) == expect, (data, d)

    run()
