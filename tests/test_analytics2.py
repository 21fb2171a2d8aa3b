"""Tests for the round-2 analytics batch: M4 downsample, cumulative
totals, staleness, token vocabulary ops, correlation moments."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pyreshaper_spark.operators.correlate import (
    corr_finish,
    source_corr_moments,
)
from pyreshaper_spark.operators.gapfill import staleness
from pyreshaper_spark.operators.rollup import (
    cumulative_tier,
    m4_cascade,
    m4_finish,
    rollup_all_tiers,
    rollup_m4,
)
from pyreshaper_spark.operators.vocab import (
    explode_tokens,
    token_ndv,
    token_topk,
    vocab_growth,
)


# -- M4 ---------------------------------------------------------------------

def test_m4_cascade_equals_direct(seq):
    direct = m4_finish(rollup_m4(seq, 3600))
    t = rollup_m4(seq, 60)
    for w in (600, 3600):
        t = m4_cascade(t, w)
    cascaded = m4_finish(t)
    assert direct.exceptAll(cascaded).count() == 0
    assert cascaded.exceptAll(direct).count() == 0


def test_m4_corners_are_real_rows(seq):
    """Every M4 corner must be an actual (event_s, n_tok) input row and
    the min/max values must match the plain tier aggregate."""
    m4 = m4_finish(rollup_m4(seq, 3600))
    pts = seq.select(
        F.col("event_s").alias("s"), F.col("n_tok").alias("v")
    ).distinct()
    for s_col, v_col in (
        ("first_s", "first_v"),
        ("last_s", "last_v"),
        ("min_s", "min_v"),
        ("max_s", "max_v"),
    ):
        corner = m4.select(
            F.col(s_col).alias("s"), F.col(v_col).alias("v")
        )
        assert corner.join(pts, ["s", "v"], "left_anti").count() == 0

    tier = rollup_all_tiers(seq, [3600])[3600]
    j = m4.join(tier, ["source", "bucket_s"])
    assert j.filter(
        (F.col("min_v") != F.col("min_n_tok"))
        | (F.col("max_v") != F.col("max_n_tok"))
    ).count() == 0


# -- cumulative -------------------------------------------------------------

def test_cumulative_last_row_is_source_total(seq):
    tier = rollup_all_tiers(seq, [3600])[3600]
    cum = cumulative_tier(tier)
    last = (
        cum.groupBy("source")
        .agg(F.max_by("cum_sum_n_tok", "bucket_s").alias("final"))
    )
    totals = seq.groupBy("source").agg(F.sum("n_tok").alias("t"))
    j = last.join(totals, "source")
    assert j.filter(F.col("final") != F.col("t")).count() == 0


def test_cumulative_is_monotone(seq):
    from pyspark.sql import Window

    tier = rollup_all_tiers(seq, [3600])[3600]
    cum = cumulative_tier(tier)
    w = Window.partitionBy("source").orderBy("bucket_s")
    bad = cum.withColumn("prev", F.lag("cum_cnt").over(w)).filter(
        F.col("prev").isNotNull() & (F.col("cum_cnt") <= F.col("prev"))
    )
    assert bad.count() == 0


# -- staleness --------------------------------------------------------------

def test_staleness_against_driver_compute(seq):
    rows = {r["source"]: r for r in staleness(seq).collect()}
    raw = seq.groupBy("source").agg(
        F.max("event_s").alias("last"), F.count("*").alias("n")
    ).collect()
    hw = max(r["last"] for r in raw)
    for r in raw:
        got = rows[r["source"]]
        assert got["staleness_s"] == hw - r["last"]
        assert got["n_rows"] == r["n"]
    # fixed now_s overrides the high-water mark
    fixed = {
        r["source"]: r["staleness_s"]
        for r in staleness(seq, now_s=hw + 100).collect()
    }
    for r in raw:
        assert fixed[r["source"]] == hw + 100 - r["last"]


# -- vocabulary ops (over the production xxhash64 token stream) -------------

def test_token_topk_is_topk_with_deterministic_ties(seq):
    tok = explode_tokens(seq)
    top = token_topk(tok, 86400, 3)
    counts = (
        tok.select(
            "source",
            ((F.col("event_s") / 86400).cast("long") * 86400).alias("bucket_s"),
            "token",
        )
        .groupBy("source", "bucket_s", "token")
        .agg(F.count("*").alias("cnt"))
    )
    # spot-check one group driver-side
    one = counts.limit(1).collect()[0]
    rows = (
        counts.filter(
            (F.col("source") == one["source"])
            & (F.col("bucket_s") == one["bucket_s"])
        )
        .collect()
    )
    expect = sorted(rows, key=lambda r: (-r["cnt"], r["token"]))[:3]
    got = (
        top.filter(
            (F.col("source") == one["source"])
            & (F.col("bucket_s") == one["bucket_s"])
        )
        .orderBy("rank")
        .collect()
    )
    assert [(r["token"], r["cnt"]) for r in got] == [
        (r["token"], r["cnt"]) for r in expect
    ]
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))


def test_vocab_growth_totals(seq):
    tok = explode_tokens(seq)
    g = vocab_growth(tok, 3600).orderBy("bucket_s").collect()
    total_vocab = tok.select("token").distinct().count()
    assert g[-1]["vocab_size"] == total_vocab
    assert sum(r["new_tokens"] for r in g) == total_vocab
    # running sum really runs
    acc = 0
    for r in g:
        acc += r["new_tokens"]
        assert r["vocab_size"] == acc


def test_token_ndv_bounds(seq):
    nd = token_ndv(explode_tokens(seq), 86400)
    bad = nd.filter(
        (F.col("ndv_token") > F.col("n_tok_occ")) | (F.col("ndv_token") < 1)
    )
    assert bad.count() == 0


# -- HLL sketch cascade -----------------------------------------------------

def test_ndv_sketch_cascade_equals_direct_sketch(seq):
    """HLL register union is an exact set-union merge: cascading
    1m→10m→1h sketches must give the IDENTICAL estimate as sketching
    the 1h buckets directly."""
    from pyreshaper_spark.operators.rollup import (
        ndv_sketch_cascade,
        ndv_sketch_finish,
        ndv_sketch_tier0,
    )

    t = ndv_sketch_tier0(seq, 60)
    for w in (600, 3600):
        t = ndv_sketch_cascade(t, w)
    casc = ndv_sketch_finish(t)
    direct = ndv_sketch_finish(ndv_sketch_tier0(seq, 3600))
    assert casc.exceptAll(direct).count() == 0
    assert direct.exceptAll(casc).count() == 0


def test_ndv_sketch_error_bounded(seq):
    from pyreshaper_spark.operators.rollup import (
        bucket_ndv,
        ndv_sketch_finish,
        ndv_sketch_tier0,
    )

    est = ndv_sketch_finish(ndv_sketch_tier0(seq, 3600)).withColumnRenamed(
        "ndv_n_tok", "est"
    )
    exact = bucket_ndv(seq, 3600).select(
        "source", "bucket_s", F.col("ndv_n_tok").alias("exact")
    )
    j = est.join(exact, ["source", "bucket_s"]).collect()
    assert len(j) > 0
    for r in j:
        assert abs(r["est"] - r["exact"]) <= max(2, 0.05 * r["exact"])


# -- EWMA -------------------------------------------------------------------

def test_ewma_binary_against_driver_compute(seq):
    from pyreshaper_spark.operators.gapfill import ewma_binary

    tier = rollup_all_tiers(seq, [3600])[3600].select(
        "source", "bucket_s", F.col("sum_n_tok").cast("long").alias("sum_n_tok")
    )
    k = 4
    got = {
        (r["source"], r["bucket_s"]): (r["ewma_num"], r["ewma_den"])
        for r in ewma_binary(tier, k=k).collect()
    }
    series = {}
    for r in tier.collect():
        series.setdefault(r["source"], []).append(
            (r["bucket_s"], r["sum_n_tok"])
        )
    for src, pts in series.items():
        pts.sort()
        for idx, (b, _v) in enumerate(pts):
            num = den = 0
            for i in range(k):
                if idx - i < 0:
                    continue
                w = 1 << (k - 1 - i)
                num += pts[idx - i][1] * w
                den += w
            assert got[(src, b)] == (num, den)


# -- anomaly z-flag ---------------------------------------------------------

def test_anomaly_zflag_matches_float_zscore(seq):
    """The exact integer comparison must agree with the float z-score
    on every row (fixture values are far from the float boundary)."""
    from pyreshaper_spark.operators.gapfill import anomaly_zflag

    tier = rollup_all_tiers(seq, [600])[600].select(
        "source", "bucket_s", F.col("sum_n_tok").cast("long").alias("sum_n_tok")
    )
    k, z = 6, 2
    got = {
        (r["source"], r["bucket_s"]): (r["roll_n"], r["is_anomaly"])
        for r in anomaly_zflag(tier, k=k, z_num=z, z_den=1).collect()
    }
    series = {}
    for r in tier.collect():
        series.setdefault(r["source"], []).append(
            (r["bucket_s"], r["sum_n_tok"])
        )
    n_flagged = 0
    for src, pts in series.items():
        pts.sort()
        for idx, (b, v) in enumerate(pts):
            wnd = [p[1] for p in pts[max(0, idx - k):idx]]
            n = len(wnd)
            expect = False
            if n >= 3:
                s, ss = sum(wnd), sum(x * x for x in wnd)
                expect = (v * n - s) ** 2 > z * z * (n * ss - s * s)
            assert got[(src, b)] == (n, expect), (src, b)
            n_flagged += expect
    assert n_flagged > 0  # the fixture must exercise both branches


# -- seasonal diff ----------------------------------------------------------

def test_seasonal_diff_bucket_keyed_not_row_lag(spark):
    """A missing prior-season bucket must yield NULL, never a shifted
    comparison (the row-lag failure mode)."""
    from pyreshaper_spark.operators.gapfill import seasonal_diff

    rows = [
        ("a", 0, 10), ("a", 600, 11),
        # 1200 missing
        ("a", 1800, 13), ("a", 2400, 99),
    ]
    tier = spark.createDataFrame(
        rows, "source string, bucket_s long, sum_n_tok long"
    )
    got = {
        r["bucket_s"]: (r["prev_v"], r["season_delta"])
        for r in seasonal_diff(tier, period_s=1200).collect()
    }
    assert got[0] == (None, None)
    assert got[600] == (None, None)
    assert got[1800] == (11, 2)       # 1800-1200=600 present
    assert got[2400] == (None, None)  # 1200 missing → NULL, not 10/11


# -- correlation ------------------------------------------------------------

def test_corr_moments_and_pearson_match_numpy(seq):
    import numpy as np

    tier = rollup_all_tiers(seq, [3600])[3600]
    mom = source_corr_moments(tier)
    r_df = {
        (r["source_a"], r["source_b"]): r["pearson_r"]
        for r in corr_finish(mom).collect()
    }
    piv = {}
    for r in tier.select("source", "bucket_s", "sum_n_tok").collect():
        piv.setdefault(r["source"], {})[r["bucket_s"]] = r["sum_n_tok"]
    srcs = sorted(piv)
    checked = 0
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            shared = sorted(set(piv[a]) & set(piv[b]))
            if len(shared) < 2:
                continue
            x = np.array([piv[a][s] for s in shared], dtype=float)
            y = np.array([piv[b][s] for s in shared], dtype=float)
            if x.std() == 0 or y.std() == 0:
                assert r_df[(a, b)] is None
                continue
            expect = float(np.corrcoef(x, y)[0, 1])
            assert math.isclose(r_df[(a, b)], expect, rel_tol=1e-9)
            checked += 1
    assert checked > 0


def test_corr_sources_filter_restricts_pairs(seq):
    tier = rollup_all_tiers(seq, [3600])[3600]
    mom = source_corr_moments(tier, sources=["src0", "src1", "src2"])
    pairs = {
        (r["source_a"], r["source_b"]) for r in mom.select(
            "source_a", "source_b"
        ).collect()
    }
    assert pairs <= {("src0", "src1"), ("src0", "src2"), ("src1", "src2")}
    assert len(pairs) > 0
