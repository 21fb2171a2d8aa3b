"""Unit tests for pc1 power iteration and centroid drift."""

from __future__ import annotations

import numpy as np
from pyspark.sql import Row
from pyspark.sql import functions as F

from pyreshaper_spark.operators.pca import (
    SCALE,
    pc1_direction,
    pc1_projection,
)
from pyreshaper_spark.operators.similarity import centroid_drift


def _emb(spark, mat, labels=None):
    n = len(mat)
    labels = labels or ["l%d" % (i % 3) for i in range(n)]
    return spark.createDataFrame(
        [
            Row(vec_id=i, embedding=[float(x) for x in mat[i]],
                label=labels[i])
            for i in range(n)
        ]
    )


def test_pc1_direction_matches_numpy(spark):
    # anisotropic cloud: dominant direction is a known unit vector
    rng = np.random.RandomState(7)
    d = 64
    u = np.zeros(d)
    u[0], u[3], u[10] = 0.8, 0.5, 0.33
    u /= np.linalg.norm(u)
    mat = (
        rng.randn(120, 1) * 0.9 * u[None, :]
        + rng.randn(120, d) * 0.05
    )
    emb = _emb(spark, mat)
    v = np.zeros(d)
    for r in pc1_direction(emb, n_iter=4).collect():
        v[r.dim] = r.v
    v = v / np.linalg.norm(v)
    # un-centered top singular direction of the quantized matrix
    q = np.round(mat * 10_000)
    _, _, vt = np.linalg.svd(q, full_matrices=False)
    ref = vt[0] / np.linalg.norm(vt[0])
    cos = abs(float(np.dot(v, ref)))
    assert cos > 0.999, cos


def test_pc1_projection_values_are_exact_dots(spark):
    rng = np.random.RandomState(3)
    mat = rng.randn(30, 64) * 0.3
    emb = _emb(spark, mat)
    vrows = {r.dim: r.v for r in pc1_direction(emb, n_iter=3).collect()}
    v = np.array([vrows[i] for i in range(64)], dtype=object)
    q = np.round(mat * 10_000).astype(np.int64)
    got = {r.vec_id: r.proj for r in pc1_projection(emb, n_iter=3).collect()}
    for i in range(30):
        expect = int(sum(int(a) * int(b) for a, b in zip(q[i], v)))
        assert got[i] == expect
    # direction is at fixed-point scale
    assert max(abs(int(x)) for x in v) == SCALE


def test_centroid_drift_two_days_exact(spark):
    # one source, two days, hand-computed centroid movement
    emb = _emb(
        spark,
        [[1.0] + [0.0] * 63, [0.0, 1.0] + [0.0] * 62, [1.0] + [0.0] * 63],
    )
    days = spark.createDataFrame(
        [
            Row(vec_id=0, source="a", day_s=0),
            Row(vec_id=1, source="a", day_s=0),
            Row(vec_id=2, source="a", day_s=86400),
        ]
    )
    out = centroid_drift(days, emb).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.source, r.day_s, r.n_cur, r.n_prev) == ("a", 86400, 1, 2)
    # s_prev = (10000, 10000, 0...), n_prev=2; s_cur = (20000? no:
    # quantized 1.0 -> 10000). s_cur=(10000,0,...), n_cur=1
    # diff_d = s_cur_d*n_prev - s_prev_d*n_cur
    # d = (10000*2 - 10000*1, 0*2 - 10000*1) = (10000, -10000)
    assert int(r.d2_num) == 10000**2 + 10000**2


def test_centroid_drift_no_consecutive_days(spark):
    emb = _emb(spark, [[1.0] + [0.0] * 63, [1.0] + [0.0] * 63])
    days = spark.createDataFrame(
        [
            Row(vec_id=0, source="a", day_s=0),
            Row(vec_id=1, source="a", day_s=2 * 86400),
        ]
    )
    assert centroid_drift(days, emb).count() == 0


def test_dup_rate_by_day(spark):
    from pyreshaper_spark.operators.dedup import dup_rate_by_day

    docs = spark.createDataFrame(
        [
            Row(doc_id="1", text="alpha", day_s=0),
            Row(doc_id="2", text="alpha", day_s=0),      # same-day dup
            Row(doc_id="3", text="beta", day_s=0),
            Row(doc_id="4", text="alpha", day_s=86400),  # cross-day dup
            Row(doc_id="5", text="gamma", day_s=86400),
        ]
    )
    out = {r.day_s: r for r in dup_rate_by_day(docs).collect()}
    assert (out[0].n_docs, out[0].n_new_hashes) == (3, 2)
    assert out[0].dup_ppm == 1_000_000 // 3
    assert (out[86400].n_docs, out[86400].n_new_hashes) == (2, 1)
    assert out[86400].dup_ppm == 500_000


def test_pii_rate_aggregates(spark):
    from pyreshaper_spark.operators.text import pii_rate

    docs = spark.createDataFrame(
        [
            Row(source="a", day_s=0, text="mail me a@b.com now"),
            Row(source="a", day_s=0, text="clean text"),
            Row(source="a", day_s=86400, text="ip 10.0.0.1 and 1234567890"),
        ]
    )
    out = {(r.source, r.day_s): r for r in pii_rate(docs).collect()}
    d0 = out[("a", 0)]
    assert (d0.n_docs, d0.n_pii_docs, d0.n_emails) == (2, 1, 1)
    assert d0.pii_ppm == 500_000
    d1 = out[("a", 86400)]
    assert d1.n_pii_docs == 1 and d1.n_ipv4 == 1 and d1.n_digit_runs >= 1


def test_datacard_by_source(spark):
    from pyreshaper_spark.operators.text import datacard_by_source

    import re

    good = "the and of to is in that with " + "wind xylo yarn zeta " * 5
    nw = len(re.split(r"\s+", good))  # regex split keeps a trailing ''
    docs = spark.createDataFrame(
        [
            Row(doc_id="1", source="a", text=good),
            Row(doc_id="2", source="a", text=good),        # exact dup
            Row(doc_id="3", source="a", text="短 le la les et des"),
            Row(doc_id="4", source="b", text="a@b.com " + good),
        ]
    )
    out = {r.source: r for r in datacard_by_source(docs).collect()}
    a = out["a"]
    assert a.n_docs == 3
    # dup: 3 docs, 2 distinct hashes → 1/3
    assert a.dup_ppm == 1_000_000 // 3
    # quality: docs 1,2 pass (long + diverse); doc 3 fails (<10 words)
    assert a.ok_ppm == 2 * 1_000_000 // 3
    assert a.pii_ppm == 0
    # majority language: two English docs vs one French
    assert a.top_lang == "en"
    # median words: sorted word counts (6, nw, nw) → lower median nw
    assert a.p50_words == nw
    b = out["b"]
    assert b.pii_ppm == 1_000_000 and b.n_docs == 1
    assert b.p50_words == nw + 1


def test_hopping_rollup_calendar_true(spark):
    from pyreshaper_spark.operators.rollup import hopping_rollup

    # two 10m buckets: 0 and 3000s; window 1800, hop 600
    tier = spark.createDataFrame(
        [
            Row(source="a", bucket_s=0, sum_n_tok=5),
            Row(source="a", bucket_s=3000, sum_n_tok=7),
        ]
    )
    out = {
        r.win_start_s: (r.n_buckets, r.sum_v)
        for r in hopping_rollup(tier, win_s=1800, hop_s=600).collect()
    }
    # bucket 0 lands in windows starting -1200, -600, 0
    for ws in (-1200, -600, 0):
        assert out[ws] == (1, 5)
    # bucket 3000 in windows 1800, 2400, 3000 — never shares a window
    for ws in (1800, 2400, 3000):
        assert out[ws] == (1, 7)
    assert len(out) == 6
    # reference brute force: every window [ws, ws+1800) collects the
    # buckets it contains
    rows = [(0, 5), (3000, 7)]
    for ws, (n, sv) in out.items():
        inside = [v for b, v in rows if ws <= b < ws + 1800]
        assert (len(inside), sum(inside)) == (n, sv)


def test_events_rfm(spark):
    import datetime as dt

    from pyreshaper_spark.operators.events import events_rfm

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    ev = spark.createDataFrame(
        [
            Row(event_id=1, ts=t0, user_id=1, event_type="view",
                value=1.25, props="{}"),
            Row(event_id=2, ts=t0 + dt.timedelta(days=1), user_id=1,
                event_type="purchase", value=10.50, props="{}"),
            Row(event_id=3, ts=t0 + dt.timedelta(hours=1), user_id=2,
                event_type="view", value=0.0, props="{}"),
        ]
    )
    out = {r.user_id: r for r in events_rfm(ev).collect()}
    u1 = out[1]
    assert u1.n_events == 2 and u1.active_days == 2 and u1.n_types == 2
    assert u1.sum_cents == 125 + 1050
    assert u1.purchase_cents == 1050
    assert u1.last_s - u1.first_s == 86400
    assert out[2].purchase_cents == 0


def test_events_dau_wau(spark):
    import datetime as dt

    from pyreshaper_spark.operators.events import events_dau_wau

    def ev(eid, day, uid):
        return Row(
            event_id=eid,
            ts=dt.datetime(2024, 1, 1) + dt.timedelta(days=day),
            user_id=uid, event_type="view", value=0.0, props="{}",
        )

    # day0: users 1,2; day1: user 1; day8: user 3
    df = spark.createDataFrame(
        [ev(1, 0, 1), ev(2, 0, 2), ev(3, 0, 1), ev(4, 1, 1), ev(5, 8, 3)]
    )
    out = {r.day_s: r for r in events_dau_wau(df).collect()}
    d0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp()
    assert out[d0].dau == 2 and out[d0].wau == 2
    # day1: dau 1 (user 1), wau 2 (users 1,2 within trailing 7d)
    assert out[d0 + 86400].dau == 1 and out[d0 + 86400].wau == 2
    # day8: only user 3 in window (day0/1 are 7+ days back)
    assert out[d0 + 8 * 86400].dau == 1 and out[d0 + 8 * 86400].wau == 1
    assert out[d0].stick_ppm == 1_000_000


def test_events_conversion_lag(spark):
    import datetime as dt

    from pyreshaper_spark.operators.events import events_conversion_lag

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, secs, uid, typ):
        return Row(event_id=eid, ts=t0 + dt.timedelta(seconds=secs),
                   user_id=uid, event_type=typ, value=0.0, props="{}")

    df = spark.createDataFrame(
        [
            ev(1, 0, 1, "signup"),
            ev(2, 50, 1, "purchase"),   # converts after 50 s
            ev(3, 30, 2, "purchase"),   # purchase BEFORE signup: no lag
            ev(4, 40, 2, "signup"),
            ev(5, 10, 3, "signup"),     # never purchases
        ]
    )
    out = {r.user_id: r for r in events_conversion_lag(df).collect()}
    assert out[1].lag_s == 50
    assert 2 not in out  # purchase precedes first signup
    assert 3 not in out  # no purchase


def test_pq_distortion_properties(spark):
    from pyreshaper_spark.operators.kmeans import PQ_M, pq_distortion

    rng = np.random.RandomState(5)
    emb = _emb(spark, rng.randn(40, 64) * 0.2)
    rows = pq_distortion(emb, ks=8, n_iter=2).collect()
    assert len(rows) == PQ_M
    for r in rows:
        assert r.n == 40
        assert int(r.sum_d2) >= 0
        assert r.max_d2 * r.n >= int(r.sum_d2)  # max bounds the mean
    # more codewords -> distortion can only improve (on this fixture)
    loose = {r.m: int(r.sum_d2) for r in rows}
    tight = {
        r.m: int(r.sum_d2)
        for r in pq_distortion(emb, ks=32, n_iter=2).collect()
    }
    assert sum(tight.values()) <= sum(loose.values())


def test_report_job_cli(spark, capsys):
    import json
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    import report_job

    rc = report_job.main(["--docs", "/root/testdata/sf0.001/documents.parquet"])
    assert rc == 0
    lines = [
        json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
    ]
    assert len(lines) == 20  # fixture sources
    srcs = [r["source"] for r in lines]
    assert srcs == sorted(srcs)
    for r in lines:
        assert set(r) >= {
            "source", "n_docs", "sum_words", "p50_words", "dup_ppm",
            "ok_ppm", "pii_ppm", "top_lang", "sum_tok",
            "chars_per_tok_ppm",
        }
        assert r["n_docs"] > 0 and r["sum_tok"] > 0
