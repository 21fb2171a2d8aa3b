"""Exact-integer k-means + IVF probe (operators/kmeans.py) — parity
with an independent numpy Lloyd implementation using the same
quantization, truncated-division centroid update, and tie-breaks."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyreshaper_spark.operators.kmeans import (
    ivf_kmeans_topk,
    kmeans_assign,
    lloyd,
    update,
)
from pyreshaper_spark.operators.similarity import topk_dot

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def _np_quant(emb_rows):
    ids = np.array([r["vec_id"] for r in emb_rows])
    # mirror quantized(): double promotion BEFORE the multiply
    q = np.rint(
        np.array([r["embedding"] for r in emb_rows], dtype=np.float64) * 10_000
    ).astype(np.int64)
    order = np.argsort(ids)
    return ids[order], q[order]


def _np_lloyd(ids, q, k, n_iter):
    cents = {int(ids[j]): q[ids == j][0] for j in range(k)}

    def assign_all(cents):
        cids = sorted(cents)
        C = np.stack([cents[c] for c in cids])
        d2 = ((q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        best = d2.argmin(axis=1)  # argmin takes the FIRST min → low cid
        return np.array([cids[b] for b in best]), d2[
            np.arange(len(q)), best
        ]

    a, d2 = assign_all(cents)
    for _ in range(n_iter):
        new = {}
        for c in np.unique(a):
            m = q[a == c]
            s = m.sum(axis=0)
            # truncated division (toward zero) ≡ Spark div / DuckDB //
            new[int(c)] = np.fix(s / len(m)).astype(np.int64)
        cents = new
        a, d2 = assign_all(cents)
    return a, d2, cents


def test_kmeans_matches_numpy_lloyd(spark, emb):
    got = {
        r["vec_id"]: (r["cluster"], r["d2"])
        for r in kmeans_assign(emb, k=8, n_iter=2).collect()
    }
    ids, q = _np_quant(emb.collect())
    a, d2, _ = _np_lloyd(ids, q, 8, 2)
    want = {int(i): (int(c), int(d)) for i, c, d in zip(ids, a, d2)}
    assert got == want


def test_centroids_match_numpy(spark, emb):
    _, cents = lloyd(emb, k=8, n_iter=2)
    got = {r["cid"]: list(r["c"]) for r in cents.collect()}
    ids, q = _np_quant(emb.collect())
    _, _, np_cents = _np_lloyd(ids, q, 8, 2)
    assert got == {c: list(v) for c, v in np_cents.items()}


def test_update_drops_empty_clusters(spark):
    df = spark.createDataFrame(
        [(0, [0, 0], 5, 0), (1, [10, 10], 5, 0)],
        "vec_id int, q array<long>, cluster int, d2 long",
    )
    out = update(df, dim=2).collect()
    assert len(out) == 1 and out[0]["cid"] == 5
    assert list(out[0]["c"]) == [5, 5]


def test_ivf_kmeans_recall_vs_brute_force(spark, emb):
    """nprobe=2 of 8 lists after 2 iterations must recover most exact
    top-5 dot neighbors (sanity floor, not a tuning claim)."""
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in topk_dot(emb, n_queries=10, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_kmeans_topk(
            emb, k=8, n_iter=2, n_queries=10, topk=5, nprobe=2
        ).collect()
    }
    assert len(approx & exact) / len(exact) >= 0.5


def test_ivf_kmeans_ranks_are_dense_per_query(spark, emb):
    rows = ivf_kmeans_topk(
        emb, k=8, n_iter=2, n_queries=10, topk=5, nprobe=2
    ).collect()
    per_q: dict[int, list[int]] = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(per_q) == set(range(10))
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_semdedup_recall_vs_brute_force(spark, emb):
    """Within-cluster pairs must be a SUBSET of the brute-force pairs
    (exact threshold on both sides) with nontrivial recall at k=8."""
    from pyreshaper_spark.operators.kmeans import semdedup_pairs
    from pyreshaper_spark.operators.similarity import cosine_near_dups_exact

    exact = {
        (r["vec_a"], r["vec_b"])
        for r in cosine_near_dups_exact(emb, num=2, den=5).collect()
    }
    sem = {
        (r["vec_a"], r["vec_b"])
        for r in semdedup_pairs(emb, k=8, n_iter=2, num=2, den=5).collect()
    }
    assert sem <= exact
    if exact:
        assert len(sem) / len(exact) >= 0.3


def test_cluster_sample_cap_subset_and_group_limit(spark):
    """≤ per_cluster rows per cluster; sampled rows keep their
    kmeans_assign cluster; the rank ≤ k predicate pushes below the
    window exchange (WindowGroupLimit)."""
    from collections import Counter

    from pyreshaper_spark.operators.kmeans import (
        cluster_sample,
        kmeans_assign,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = cluster_sample(emb, k=8, n_iter=1, per_cluster=3)
    rows = df.collect()
    per = Counter(r["cluster"] for r in rows)
    assert per and max(per.values()) <= 3
    full = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(emb, k=8, n_iter=1).collect()
    }
    assert all(full[r["vec_id"]] == r["cluster"] for r in rows)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


# ---- product quantization ---------------------------------------------------


def test_pq_adc_equals_reconstruction_distance(spark, emb):
    """ADC is not an estimate of itself: every reported ad2 must equal
    the exact squared L2 distance between the query and the neighbor's
    RECONSTRUCTION (its M codewords concatenated) — verified in numpy
    against the collected codes + codebook."""
    from pyreshaper_spark.operators.kmeans import pq_topk, pq_train
    from pyreshaper_spark.operators.similarity import quantized

    a, cb = pq_train(emb, ks=16, n_iter=2)
    codes = {(r["vec_id"], r["m"]): r["code"] for r in a.collect()}
    book = {(r["m"], r["cid"]): np.array(r["c"]) for r in cb.collect()}
    qv = {r["vec_id"]: np.array(r["q"]) for r in quantized(emb).collect()}
    m_sub = 4
    out = pq_topk(emb, ks=16, n_iter=2, n_queries=10, topk=5).collect()
    assert out
    for r in out:
        recon = np.concatenate(
            [book[(m, codes[(r["neighbor_id"], m)])] for m in range(m_sub)]
        )
        want = int(((qv[r["query_id"]] - recon) ** 2).sum())
        assert r["ad2"] == want, (r["query_id"], r["neighbor_id"])


def test_pq_recall_vs_exact_l2(spark, emb):
    """Recall ladder vs the exact L2 top-5 on the 500-vector fixture
    (random-pick baseline ≈ 5/499 ≈ 1 %): raw ADC with 4×16-codeword
    codebooks over 64 near-uncorrelated dims is a coarse screen —
    measured 0.18, floored at 0.1 (10× random, sanity not tuning) —
    and the exact re-rank ladder must strictly repair it: refine=8
    measured 0.60, floored at 0.4, and refined recall may never drop
    below the raw shortlist's."""
    from pyreshaper_spark.operators.kmeans import pq_topk, pq_topk_refined
    from pyreshaper_spark.operators.similarity import quantized

    qrows = quantized(emb).collect()
    ids = np.array([r["vec_id"] for r in qrows])
    mat = np.array([r["q"] for r in qrows], dtype=np.int64)
    exact = set()
    for qi in range(10):
        qvec = mat[ids == qi][0]
        d2 = ((mat - qvec) ** 2).sum(axis=1)
        order = np.lexsort((ids, d2))
        top = [int(ids[j]) for j in order if ids[j] != qi][:5]
        exact.update((qi, n) for n in top)
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_topk(emb, ks=16, n_iter=2, n_queries=10, topk=5).collect()
    }
    raw_recall = len(approx & exact) / len(exact)
    assert raw_recall >= 0.1
    refined = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_topk_refined(
            emb, ks=16, n_iter=2, n_queries=10, topk=5, refine=8
        ).collect()
    }
    refined_recall = len(refined & exact) / len(exact)
    assert refined_recall >= 0.4
    assert refined_recall >= raw_recall


def test_pq_ranks_dense_per_query(spark, emb):
    from pyreshaper_spark.operators.kmeans import pq_topk

    rows = pq_topk(emb, ks=16, n_iter=2, n_queries=10, topk=5).collect()
    per_q: dict[int, list[int]] = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(per_q) == set(range(10))
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, 6))


# ---- IVF-PQ (IVFADC) --------------------------------------------------------


def test_ivfpq_adc_equals_residual_reconstruction(spark, emb):
    """Every reported ad2 must equal the exact squared L2 distance
    between the query's residual (w.r.t. the probed list's centroid)
    and the neighbor's residual RECONSTRUCTION — verified in numpy
    against the collected index + codebook + centroids. Also pins the
    IVF pruning property: a neighbor only ever surfaces from its own
    stored list, and that list must be among the query's nprobe
    nearest."""
    from pyreshaper_spark.operators.kmeans import ivfpq_topk, ivfpq_train
    from pyreshaper_spark.operators.similarity import quantized

    index, cb, cents = ivfpq_train(emb, k_coarse=8, ks=16, n_iter=2)
    codes = {}
    vec_list = {}
    for r in index.collect():
        codes[(r["vec_id"], r["m"])] = r["code"]
        vec_list[r["vec_id"]] = r["cluster"]
    book = {(r["m"], r["cid"]): np.array(r["c"]) for r in cb.collect()}
    cent = {r["cid"]: np.array(r["c"]) for r in cents.collect()}
    qv = {r["vec_id"]: np.array(r["q"]) for r in quantized(emb).collect()}
    out = ivfpq_topk(
        emb, k_coarse=8, ks=16, n_iter=2, n_queries=10, topk=5, nprobe=2
    ).collect()
    assert out
    for r in out:
        lst = vec_list[r["neighbor_id"]]
        # the query's nprobe=2 nearest lists (ties to smaller cid)
        ds = sorted(
            (int(((qv[r["query_id"]] - c) ** 2).sum()), cid)
            for cid, c in cent.items()
        )
        probed = {cid for _, cid in ds[:2]}
        assert lst in probed
        q_res = qv[r["query_id"]] - cent[lst]
        recon = np.concatenate(
            [book[(m, codes[(r["neighbor_id"], m)])] for m in range(4)]
        )
        assert r["ad2"] == int(((q_res - recon) ** 2).sum())


def test_ivfpq_recall_vs_exact_l2(spark, emb):
    """IVFADC recall on the 500-vector fixture: residual PQ quantizes
    tighter than flat PQ, but nprobe=2-of-8 pruning can drop true
    neighbors in other lists — the floor is the sanity bound over the
    composition (random baseline ≈ 1 %)."""
    from pyreshaper_spark.operators.kmeans import ivfpq_topk
    from pyreshaper_spark.operators.similarity import quantized

    qrows = quantized(emb).collect()
    ids = np.array([r["vec_id"] for r in qrows])
    mat = np.array([r["q"] for r in qrows], dtype=np.int64)
    exact = set()
    for qi in range(10):
        qvec = mat[ids == qi][0]
        d2 = ((mat - qvec) ** 2).sum(axis=1)
        order = np.lexsort((ids, d2))
        top = [int(ids[j]) for j in order if ids[j] != qi][:5]
        exact.update((qi, n) for n in top)
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivfpq_topk(
            emb, k_coarse=8, ks=16, n_iter=2, n_queries=10, topk=5, nprobe=2
        ).collect()
    }
    assert len(approx & exact) / len(exact) >= 0.1
