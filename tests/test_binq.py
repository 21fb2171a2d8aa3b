"""Binary-quantization ANN: packing correctness vs numpy, Hamming
exactness, and recall of the shortlist-reranked top-k vs brute force."""

from __future__ import annotations

import math

import numpy as np

from pyreshaper_spark.operators.similarity import (
    BINQ_WORD,
    QUANT,
    binary_codes,
    binq_topk,
    topk_dot,
)


def _emb_df(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def _ref_codes(vecs, dim):
    n_words = math.ceil(dim / BINQ_WORD)
    out = []
    for v in vecs:
        q = np.round(np.asarray(v, dtype=np.float64) * QUANT).astype(np.int64)
        words = [0] * n_words
        for i, x in enumerate(q):
            if x > 0:
                words[i // BINQ_WORD] |= 1 << (i % BINQ_WORD)
        out.append(words)
    return out


def test_binary_codes_match_numpy_packing(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(20, 64)).astype(np.float32)
    got = {
        r["vec_id"]: list(r["code"])
        for r in binary_codes(_emb_df(spark, vecs)).collect()
    }
    ref = _ref_codes([list(map(float, v)) for v in vecs], 64)
    assert got == {i: w for i, w in enumerate(ref)}
    # every word must stay within unsigned-32 range (bit 63 never set)
    assert all(0 <= w < 2**32 for ws in got.values() for w in ws)


def test_binq_sign_boundary_zero_is_unset(spark):
    # exact zeros quantize to 0 -> bit NOT set (matches the > 0 rule)
    vecs = [[0.0] * 64, [1.0] * 64]
    got = {
        r["vec_id"]: list(r["code"])
        for r in binary_codes(_emb_df(spark, vecs)).collect()
    }
    assert got[0] == [0, 0]
    assert got[1] == [2**32 - 1, 2**32 - 1]


def test_binq_topk_recall_vs_exact(spark):
    # clustered vectors: binary sketch must place same-cluster
    # neighbors in the shortlist; rerank makes top-k near-exact
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(5, 64)) * 3
    vecs = np.vstack([
        centers[i % 5] + rng.normal(size=64) * 0.3 for i in range(100)
    ]).astype(np.float32)
    emb = _emb_df(spark, vecs)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in topk_dot(emb, n_queries=5, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in binq_topk(emb, n_queries=5, k=5, shortlist=25).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, recall
    # and must beat random chance (5/99) by a wide margin
    assert recall > 5 * (5 / 99)
