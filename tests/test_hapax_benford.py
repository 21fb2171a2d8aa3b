"""Hapax-legomena rollup and Benford first-digit distribution:
pandas brute-force parity and digit-extraction edge cases."""

from __future__ import annotations

import collections

from pyreshaper_spark.operators.drift import benford_counts, benford_finish
from pyreshaper_spark.operators.vocab import token_hapax


def test_token_hapax_matches_brute_force(spark):
    # bucket 0: tokens [5, 5, 7, 9]  -> types 3, hapax 2 (7, 9), dis 1 (5)
    # bucket 3600: tokens [7, 7, 7]  -> types 1, hapax 0, dis 0
    rows = [
        ("a", 10, 5), ("a", 20, 5), ("a", 30, 7), ("a", 3599, 9),
        ("a", 3600, 7), ("a", 3601, 7), ("a", 7199, 7),
        ("b", 50, 1),
    ]
    tok = spark.createDataFrame(
        rows, "source string, event_s long, token long"
    )
    out = {
        (r["source"], r["bucket_s"]): r
        for r in token_hapax(tok, 3600).collect()
    }
    a0 = out[("a", 0)]
    assert (a0["n_types"], a0["n_tokens"]) == (3, 4)
    assert (a0["n_hapax"], a0["n_dis"]) == (2, 1)
    a1 = out[("a", 3600)]
    assert (a1["n_types"], a1["n_tokens"]) == (1, 3)
    assert (a1["n_hapax"], a1["n_dis"]) == (0, 0)
    b0 = out[("b", 0)]
    assert (b0["n_types"], b0["n_hapax"]) == (1, 1)


def test_benford_digit_extraction_and_counts(spark):
    # values spanning 1 digit to >int32, plus zero/negative excluded
    vals = [1, 9, 10, 19, 99, 100, 987, 1_000_000, 2**40, 0, -5, 7]
    rows = [("s0", i, v) for i, v in enumerate(vals)]
    seq = spark.createDataFrame(
        rows, "source string, doc_id long, n_tok long"
    )
    got = {
        r["digit"]: r["n_docs"]
        for r in benford_counts(seq, value_col="n_tok").collect()
    }
    ref = collections.Counter(
        int(str(v)[0]) for v in vals if v > 0
    )
    assert got == dict(ref)


def test_benford_finish_shares_and_expected(spark):
    import math

    rows = [("s0", i, v) for i, v in enumerate([1, 1, 1, 2, 9])]
    seq = spark.createDataFrame(
        rows, "source string, doc_id long, n_tok long"
    )
    out = {
        r["digit"]: r
        for r in benford_finish(benford_counts(seq)).collect()
    }
    assert abs(out[1]["obs_share"] - 3 / 5) < 1e-12
    assert abs(out[1]["benford_share"] - math.log10(2)) < 1e-12
    assert abs(out[9]["benford_share"] - math.log10(10 / 9)) < 1e-12
