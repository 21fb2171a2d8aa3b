"""Spearman rank-correlation moments: average-rank tie identity,
moment exactness, and rho parity vs a pandas-rank reference."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyreshaper_spark.operators.correlate import (
    corr_finish,
    source_spearman_moments,
)


def _tier(spark, rows):
    return spark.createDataFrame(
        rows, "source string, bucket_s long, sum_n_tok long"
    )


def _ref_rho(xs, ys):
    rx = pd.Series(xs).rank(method="average").to_numpy()
    ry = pd.Series(ys).rank(method="average").to_numpy()
    return float(np.corrcoef(rx, ry)[0, 1])


def test_spearman_rank2_identity_with_ties(spark):
    # a: [1, 2, 2, 3] → avg ranks [1, 2.5, 2.5, 4] → rank2 [2, 5, 5, 8]
    # sx = Σrank2 = 20 = 2·Σavg_rank = 2·n(n+1)/2
    rows = [("a", i, v) for i, v in enumerate([1, 2, 2, 3])]
    rows += [("b", i, v) for i, v in enumerate([7, 7, 7, 9])]
    m = source_spearman_moments(_tier(spark, rows)).collect()[0]
    n = m["n_buckets"]
    assert n == 4
    assert int(m["sx"]) == n * (n + 1)  # Σ(2·avg rank) is invariant
    assert int(m["sy"]) == n * (n + 1)
    # a's rank2: [2,5,5,8]; b's ([7,7,7,9]): avg ranks [2,2,2,4] → rank2
    # [4,4,4,8]; sxy = 2*4+5*4+5*4+8*8 = 112
    assert int(m["sxy"]) == 112


def test_spearman_rho_matches_pandas_rank_reference(spark):
    xs = [10, 40, 40, 7, 100, 55, 55, 55, 2, 31]
    ys = [3, 8, 9, 1, 50, 21, 21, 40, 0, 9]
    rows = [("a", i, x) for i, x in enumerate(xs)]
    rows += [("b", i, y) for i, y in enumerate(ys)]
    m = source_spearman_moments(_tier(spark, rows))
    r = corr_finish(m).collect()[0]["pearson_r"]
    assert abs(r - _ref_rho(xs, ys)) < 1e-12


def test_spearman_invariant_under_monotone_transform(spark):
    # Pearson changes under x -> x**3; Spearman must not
    xs = [1, 2, 3, 4, 5, 6]
    ys = [2, 1, 4, 3, 6, 5]
    rows = [("a", i, x ** 3) for i, x in enumerate(xs)]
    rows += [("b", i, y) for i, y in enumerate(ys)]
    m = source_spearman_moments(_tier(spark, rows))
    r = corr_finish(m).collect()[0]["pearson_r"]
    assert abs(r - _ref_rho(xs, ys)) < 1e-12
