"""Semantics pins for the Hampel outlier filter and per-source doc
concentration."""

from __future__ import annotations

from pyreshaper_spark.operators.gapfill import hampel_filter
from pyreshaper_spark.operators.sampling import doc_concentration


def _tier(spark, rows):
    return spark.createDataFrame(
        rows, "source string, bucket_s long, sum_n_tok long"
    )


def test_hampel_flags_spike_zscore_would_too(spark):
    # constant series with one spike: MAD=0 in every window, so the
    # spike (and only the spike) trips the flag at any t
    rows = [("a", i * 10, 100 if i == 3 else 10) for i in range(7)]
    out = {
        r["bucket_s"]: r for r in hampel_filter(_tier(spark, rows), 3, 3).collect()
    }
    assert out[30]["is_outlier"] is True
    assert all(not out[b]["is_outlier"] for b in out if b != 30)
    # spike bucket: med2 = 2*10, mad4 = 0
    assert out[30]["med2"] == 20 and out[30]["mad4"] == 0


def test_hampel_exact_mad_arithmetic(spark):
    # linear ramp 10..50, k=2 → center window is all 5 points:
    # med=30 (med2=60), d2s=[0,20,20,40,40] → mad4=40 (MAD=10)
    rows = [("a", i * 10, (i + 1) * 10) for i in range(5)]
    out = {
        r["bucket_s"]: r for r in hampel_filter(_tier(spark, rows), 2, 1).collect()
    }
    c = out[20]
    assert c["med2"] == 60 and c["mad4"] == 40
    assert c["is_outlier"] is False  # |30-30| = 0
    # t=1: point 50 at the center window has d2=40 → 80 > 40 → true,
    # but its OWN window is [30,40,50] (med2=80, d2=20, devs=[20,0,20]
    # sorted [0,20,20] n=3 → mad4=20+20=40) → 40 > 40 false
    assert out[40]["med2"] == 80 and out[40]["is_outlier"] is False


def test_hampel_robust_where_mean_breaks(spark):
    # a level shift contaminates the trailing MEAN/stddev but not the
    # centered median: the post-shift plateau must NOT be flagged
    rows = [("a", i * 10, 10 if i < 5 else 1000) for i in range(10)]
    out = {
        r["bucket_s"]: r for r in hampel_filter(_tier(spark, rows), 2, 3).collect()
    }
    # deep inside each plateau the window median equals the plateau
    assert out[10]["is_outlier"] is False
    assert out[80]["is_outlier"] is False


def test_doc_concentration(spark):
    seq = spark.createDataFrame(
        [("d1", "a", 100), ("d2", "a", 50), ("d3", "a", 10),
         ("d4", "a", 5), ("d5", "b", 7)],
        "doc_id string, source string, n_tok long",
    )
    out = {r["source"]: r for r in doc_concentration(seq, k=2).collect()}
    a = out["a"]
    assert (a["n_docs"], a["total_tok"], a["topk_tok"], a["max_tok"]) == (
        4, 165, 150, 100)
    b = out["b"]
    assert (b["n_docs"], b["total_tok"], b["topk_tok"], b["max_tok"]) == (
        1, 7, 7, 7)
