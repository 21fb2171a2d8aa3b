"""Within-bucket linear trend (rollup.bucket_trend) and the count-min
token sketch (vocab.token_cms)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from pyreshaper_spark.operators.rollup import (
    bucket_trend,
    rollup_all_tiers,
    trend_finish,
)
from pyreshaper_spark.operators.vocab import (
    cms_estimate,
    token_cms,
    token_stream,
)


def _tier1h(seq):
    t = rollup_all_tiers(seq, [60, 600, 3600])[3600]
    return t.select(
        "source", "bucket_s",
        F.col("sum_n_tok").cast("long").alias("sum_n_tok"),
    )


def test_trend_slope_matches_numpy_polyfit(seq):
    tier = _tier1h(seq)
    tr = bucket_trend(tier, 86400, 3600)
    got = {
        (r["source"], r["bucket_s"]): r
        for r in trend_finish(tr, 3600).collect()
    }
    pts = {}
    for r in tier.collect():
        key = (r["source"], (r["bucket_s"] // 86400) * 86400)
        t_idx = (r["bucket_s"] % 86400) // 3600
        pts.setdefault(key, []).append((t_idx, r["sum_n_tok"]))
    checked = 0
    for key, tv in pts.items():
        if len({t for t, _ in tv}) < 2:
            assert got[key]["slope_per_s"] is None
            continue
        ts = np.array([t for t, _ in tv], dtype=float)
        vs = np.array([v for _, v in tv], dtype=float)
        slope_per_fine = np.polyfit(ts, vs, 1)[0]
        np.testing.assert_allclose(
            got[key]["slope_per_s"], slope_per_fine / 3600.0,
            rtol=1e-9, atol=1e-12,
        )
        checked += 1
    assert checked >= 10


def test_trend_moments_reconstruct_mean_level(seq):
    """sv/n is the bucket mean — ties the moments back to the tier."""
    tier = _tier1h(seq)
    tr = bucket_trend(tier, 86400, 3600).collect()
    coarse = (
        tier.groupBy(
            "source",
            F.expr("(bucket_s div 86400) * 86400").alias("bucket_s"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum("sum_n_tok").alias("sv"),
        )
        .collect()
    )
    want = {(r["source"], r["bucket_s"]): (r["n"], r["sv"]) for r in coarse}
    assert {
        (r["source"], r["bucket_s"]): (r["n"], r["sv"]) for r in tr
    } == want


def _tok(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return token_stream(docs)


def test_cms_estimate_never_undercounts_and_is_bounded(spark):
    tok = _tok(spark).cache()
    depth, width = 4, 64
    cms = token_cms(tok, depth=depth, width=width).cache()
    exact = (
        tok.groupBy("source", "token")
        .agg(F.count("*").alias("true_cnt"))
        .cache()
    )
    per_source_n = dict(
        tok.groupBy("source").count().rdd.map(tuple).collect()
    )
    est = cms_estimate(cms, exact.select("source", "token"),
                       depth=depth, width=width)
    joined = est.join(exact, ["source", "token"]).collect()
    assert len(joined) == exact.count()
    import math

    for r in joined:
        # CMS never undercounts ...
        assert r["est_cnt"] >= r["true_cnt"]
        # ... and err ≤ e/width · N holds for all but a vanishing
        # fraction (per-point failure prob e^-depth ≈ 1.8%); allow a
        # loose 2x slack on the bound at 100% coverage instead of
        # sampling.
        n = per_source_n[r["source"]]
        assert r["est_cnt"] - r["true_cnt"] <= 2 * math.e / width * n
    tok.unpersist(), cms.unpersist(), exact.unpersist()


def test_cms_cells_sum_to_stream_size_per_row(spark):
    """Every sketch row partitions the stream: cell counts sum to N."""
    tok = _tok(spark)
    n = tok.count()
    cms = token_cms(tok, depth=4, width=64)
    sums = cms.groupBy("source", "cms_row").agg(
        F.sum("cnt").alias("total")
    )
    per_source = dict(
        tok.groupBy("source").count().rdd.map(tuple).collect()
    )
    rows = sums.collect()
    assert len(rows) == 4 * len(per_source)
    for r in rows:
        assert r["total"] == per_source[r["source"]]
    assert sum(per_source.values()) == n


def test_cms_merges_by_cell_addition(spark):
    """Sketch(A ∪ B) == cellwise Sketch(A) + Sketch(B) — the mergeable
    property that makes the sketch cascade/append-safe."""
    tok = _tok(spark).cache()
    half_a = tok.filter(F.col("event_s") % 2 == 0)
    half_b = tok.filter(F.col("event_s") % 2 == 1)
    whole = {
        (r["source"], r["cms_row"], r["cms_bucket"]): r["cnt"]
        for r in token_cms(tok).collect()
    }
    merged: dict = {}
    for part in (half_a, half_b):
        for r in token_cms(part).collect():
            k = (r["source"], r["cms_row"], r["cms_bucket"])
            merged[k] = merged.get(k, 0) + r["cnt"]
    assert merged == whole
    tok.unpersist()
