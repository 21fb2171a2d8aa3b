"""Hypothesis fuzz of the MinHash→LSH→verify dedup stack against a
pure-Python reference (md5 h32 + the same universal permutations):
soundness (every emitted pair carries the exact set-Jaccard counts and
passes the threshold) and completeness (every banded candidate pair
passing the threshold IS emitted)."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st

from pyreshaper_spark.functions.xhash import MINHASH_PERMS, P31
from pyreshaper_spark.operators.dedup import (
    N_BANDS,
    ROWS_PER_BAND,
    verified_near_dups,
)


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _band_sig(words: set[str]) -> list[tuple[int, ...]]:
    """Per-band minhash tuples, mirroring minhash_signatures."""
    hs = [_h32(w) for w in words]
    mins = [
        min((h * a + b) % P31 for h in hs)
        for (a, b) in MINHASH_PERMS[: N_BANDS * ROWS_PER_BAND]
    ]
    return [
        tuple(mins[band * ROWS_PER_BAND:(band + 1) * ROWS_PER_BAND])
        for band in range(N_BANDS)
    ]


WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=3, max_size=10),
    min_size=4,
    max_size=9,
)


@settings(max_examples=12, deadline=None)
@given(docs_strategy)
def test_verify_matches_python_reference(spark, doc_words):
    rows = [
        (i, " ".join(ws), "s0", len(" ".join(ws)))
        for i, ws in enumerate(doc_words)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )
    got = {
        (r["doc_a"], r["doc_b"]): (r["inter"], r["union_sz"])
        for r in verified_near_dups(docs).collect()
    }

    sets = {i: set(ws) for i, ws in enumerate(doc_words)}
    bands = {i: set(_band_sig(s)) for i, s in sets.items()}
    expect = {}
    for a in sets:
        for b in sets:
            if a >= b:
                continue
            if not (bands[a] & bands[b]):
                continue  # never LSH candidates
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if inter * 2 >= union:  # default threshold 1/2
                expect[(a, b)] = (inter, union)

    assert got == expect
