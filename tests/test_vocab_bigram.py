"""Bigram/PMI association mining and token-rarity doc quality
(operators/vocab.py::bigram_counts / bigram_pmi / doc_rarity)."""

from __future__ import annotations

import math

from pyreshaper_spark.operators.vocab import (
    bigram_counts,
    bigram_pmi,
    doc_rarity,
    pmi_finish,
)

V = 100  # tiny vocab so packed keys are easy to read


def _toy(spark):
    # "1 2" dominates src0; token 9 appears once, in doc d3 only
    rows = [
        ("d0", "src0", [1, 2, 3, 1, 2]),
        ("d1", "src0", [1, 2, 1, 2]),
        ("d2", "src0", [4]),          # too short for any bigram
        ("d3", "src1", [5, 6, 9]),
        ("d4", "src1", [5, 6, 5, 6]),
    ]
    return spark.createDataFrame(
        rows, "doc_id string, source string, tokens array<int>"
    )


def test_bigram_counts_adjacency(spark):
    got = {
        (r["source"], r["t1"], r["t2"]): r["c_xy"]
        for r in bigram_counts(_toy(spark), V).collect()
    }
    # d0: (1,2)(2,3)(3,1)(1,2); d1: (1,2)(2,1)(1,2); d2: none
    assert got[("src0", 1, 2)] == 4
    assert got[("src0", 2, 3)] == 1
    assert got[("src0", 3, 1)] == 1
    assert got[("src0", 2, 1)] == 1
    assert got[("src1", 5, 6)] == 3
    assert got[("src1", 6, 5)] == 1
    assert got[("src1", 6, 9)] == 1
    assert sum(v for (s, _, _), v in got.items() if s == "src0") == 7


def test_bigram_pmi_stats_and_assoc_flag(spark):
    out = {
        (r["source"], r["t1"], r["t2"]): r
        for r in bigram_pmi(
            _toy(spark), V, min_count=1, assoc_num=2, assoc_den=1
        ).collect()
    }
    r = out[("src0", 1, 2)]
    # src0 unigrams: 1×4, 2×4, 3×1, 4×1 → n_uni=10; bigrams total 7
    assert (r["c_x"], r["c_y"], r["n_uni"], r["n_big"]) == (4, 4, 10, 7)
    # lift = (4/7) / ((4/10)(4/10)) = 400/112 ≈ 3.57 ≥ 2 → assoc
    assert r["assoc"]
    # (2,1): lift = (1/7)/((4/10)(4/10)) = 100/112 ≈ 0.89 < 2
    assert not out[("src0", 2, 1)]["assoc"]
    # exact flag ⇔ float lift comparison, everywhere
    for rr in out.values():
        lift = (rr["c_xy"] / rr["n_big"]) / (
            (rr["c_x"] / rr["n_uni"]) * (rr["c_y"] / rr["n_uni"])
        )
        assert rr["assoc"] == (lift >= 2.0), rr


def test_pmi_finish_matches_math_log(spark):
    stats = bigram_pmi(_toy(spark), V, min_count=1)
    for r in pmi_finish(stats).collect():
        want = math.log2(
            (r["c_xy"] / r["n_big"])
            / ((r["c_x"] / r["n_uni"]) * (r["c_y"] / r["n_uni"]))
        )
        assert abs(r["pmi"] - want) < 1e-12


def test_min_count_prunes_singletons(spark):
    out = bigram_pmi(_toy(spark), V, min_count=2)
    keys = {(r["source"], r["t1"], r["t2"]) for r in out.collect()}
    assert keys == {("src0", 1, 2), ("src1", 5, 6)}


def test_doc_rarity_flags_oov_heavy_doc(spark):
    got = {r["doc_id"]: r for r in doc_rarity(_toy(spark), max_df=1).collect()}
    # token 9 and 4 are single-doc tokens; 3 appears only in d0
    assert (got["d3"]["n_occ"], got["d3"]["n_rare"]) == (3, 1)
    assert got["d3"]["min_df"] == 1
    assert got["d3"]["rare_heavy"]  # 1/3 ≥ 1/10
    assert (got["d2"]["n_occ"], got["d2"]["n_rare"]) == (1, 1)
    assert got["d1"]["n_rare"] == 0 and not got["d1"]["rare_heavy"]
    # d0 has one occurrence of df-1 token 3 → 1/5 ≥ 1/10 → heavy
    assert got["d0"]["n_rare"] == 1 and got["d0"]["rare_heavy"]


def test_token_zipf_ranks_and_finish(spark):
    import numpy as np

    from pyreshaper_spark.operators.vocab import token_zipf, zipf_finish

    tok = spark.createDataFrame(
        [("s", 0, t) for t in [1] * 8 + [2] * 4 + [3] * 2 + [4] * 2 + [5]],
        "source string, event_s long, token long",
    )
    curve = token_zipf(tok)
    got = {r["rank"]: (r["token"], r["cnt"]) for r in curve.collect()}
    # tie at cnt=2 breaks by token asc: 3 before 4
    assert got == {1: (1, 8), 2: (2, 4), 3: (3, 2), 4: (4, 2), 5: (5, 1)}
    fin = zipf_finish(curve).collect()[0]
    x = np.log(np.array([1, 2, 3, 4, 5], dtype=float))
    y = np.log(np.array([8, 4, 2, 2, 1], dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    assert abs(fin["slope"] - slope) < 1e-12
    assert abs(fin["intercept"] - intercept) < 1e-12


def test_counter_rate_reset_correction(spark):
    from pyreshaper_spark.operators.gapfill import counter_rate

    tier = spark.createDataFrame(
        [("s", 0, 10), ("s", 600, 25), ("s", 1200, 5), ("s", 2400, 7)],
        "source string, bucket_s long, sum_n_tok long",
    )
    got = {r["bucket_s"]: r for r in counter_rate(tier).collect()}
    assert got[0]["increase"] is None and not got[0]["reset"]
    assert got[600]["increase"] == 15 and not got[600]["reset"]
    # 25 → 5 is a reset: increase = new value, not -20
    assert got[1200]["increase"] == 5 and got[1200]["reset"]
    assert got[2400]["increase"] == 2 and got[2400]["dt_s"] == 1200


def test_token_gini_hand_case(spark):
    """gini_num = Σ(2r−k−1)c over counts ranked asc: counts (1,9) →
    8 (G=0.4); uniform counts → 0 (G=0)."""
    from pyreshaper_spark.operators.vocab import token_gini

    tok = spark.createDataFrame(
        # bucket 0: token 5 ×9, token 3 ×1 → skewed
        [("s", 10, 5)] * 9 + [("s", 20, 3)]
        # bucket 3600: tokens 1,2 ×2 each → uniform
        + [("s", 3700, 1), ("s", 3800, 1), ("s", 3900, 2), ("s", 3950, 2)],
        "source string, event_s long, token long",
    )
    got = {r["bucket_s"]: r for r in token_gini(tok, 3600).collect()}
    assert (got[0]["n_occ"], got[0]["n_types"], got[0]["gini_num"]) == (10, 2, 8)
    assert got[3600]["gini_num"] == 0


def test_doc_ngram_repetition_hand_case(spark):
    from pyreshaper_spark.operators.vocab import doc_ngram_repetition

    seq = spark.createDataFrame(
        [("d1", "s", [1, 2, 1, 2, 1]),   # trigrams 121,212,121 → dup
         ("d2", "s", [1, 2, 3, 4]),      # all distinct
         ("d3", "s", [1, 2])],           # too short → no row
        "doc_id string, source string, tokens array<int>",
    )
    got = {r["doc_id"]: (r["n_ngrams"], r["n_types"], r["max_cnt"])
           for r in doc_ngram_repetition(seq, n=3).collect()}
    assert got == {"d1": (3, 2, 2), "d2": (2, 2, 1)}


def test_doc_lm_score_hand_case(spark):
    """Corpus bigram counts: (1,2) appears 3× (d1 twice, d2 once),
    (2,1) once. bitlen(3)=2, bitlen(1)=1 → d1 sum_bits 2+1+2=5,
    avg 5000 div 3 = 1666; d2 sum_bits 2; d3 has no bigrams."""
    from pyreshaper_spark.operators.vocab import doc_lm_score

    seq = spark.createDataFrame(
        [("d1", "s", [1, 2, 1, 2]),
         ("d2", "s", [1, 2]),
         ("d3", "s", [7])],
        "doc_id string, source string, tokens array<int>",
    )
    got = {
        r["doc_id"]: (r["n_bg"], r["sum_bits"], r["min_c"], r["avg_mbits"])
        for r in doc_lm_score(seq).collect()
    }
    assert got == {"d1": (3, 5, 1, 1666), "d2": (1, 2, 3, 2000)}


def test_top_bigram_share_hand_case_and_no_shuffle(spark):
    from pyreshaper_spark.operators.vocab import top_bigram_share

    seq = spark.createDataFrame(
        [("d1", "s", [1, 2, 1, 2, 1]),   # bigrams 12,21,12,21 → top 2
         ("d2", "s", [3, 4, 5, 6]),      # 34,45,56 → top 1, share 1/3
         ("d3", "s", [9])],              # no bigrams → absent
        "doc_id string, source string, tokens array<int>",
    )
    df = top_bigram_share(seq, num=1, den=2)
    got = {
        r["doc_id"]: (r["n_bg"], r["top_cnt"], r["rep_heavy"])
        for r in df.collect()
    }
    assert got == {"d1": (4, 2, True), "d2": (3, 1, False)}
    # the whole operator is one codegen projection — no exchange, no
    # explode-induced aggregation
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "HashAggregate" not in plan
