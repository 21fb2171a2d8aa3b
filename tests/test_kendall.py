"""Kendall tau-b pair counts: brute-force pair-classification parity,
tie bookkeeping, and the tau-b finish vs an itertools reference."""

from __future__ import annotations

import itertools
import math

from pyreshaper_spark.operators.correlate import (
    kendall_finish,
    source_kendall_counts,
)


def _tier(spark, rows):
    return spark.createDataFrame(
        rows, "source string, bucket_s long, sum_n_tok long"
    )


def _ref_counts(xs, ys):
    nc = nd = tx = ty = txy = 0
    for (x1, y1), (x2, y2) in itertools.combinations(zip(xs, ys), 2):
        dx, dy = x2 - x1, y2 - y1
        if dx == 0 and dy == 0:
            txy += 1
        elif dx == 0:
            tx += 1
        elif dy == 0:
            ty += 1
        elif (dx > 0) == (dy > 0):
            nc += 1
        else:
            nd += 1
    return nc, nd, tx, ty, txy


def _ref_tau_b(xs, ys):
    nc, nd, tx, ty, txy = _ref_counts(xs, ys)
    n0 = nc + nd + tx + ty + txy
    n1, n2 = tx + txy, ty + txy
    return (nc - nd) / math.sqrt((n0 - n1) * (n0 - n2))


def _run(spark, xs, ys):
    rows = [("a", i, x) for i, x in enumerate(xs)]
    rows += [("b", i, y) for i, y in enumerate(ys)]
    return source_kendall_counts(_tier(spark, rows)).collect()[0]


def test_kendall_counts_match_brute_force(spark):
    xs = [10, 40, 40, 7, 100, 55, 55, 55, 2, 31]
    ys = [3, 8, 9, 1, 50, 21, 21, 40, 0, 9]
    row = _run(spark, xs, ys)
    nc, nd, tx, ty, txy = _ref_counts(xs, ys)
    assert (row["nc"], row["nd"]) == (nc, nd)
    assert (row["tie_x"], row["tie_y"], row["tie_xy"]) == (tx, ty, txy)
    n = len(xs)
    assert row["n_buckets"] == n
    total = row["nc"] + row["nd"] + row["tie_x"] + row["tie_y"] + row["tie_xy"]
    assert total == n * (n - 1) // 2


def test_kendall_tau_b_matches_reference(spark):
    xs = [5, 1, 9, 9, 3, 7, 2, 2, 8, 4, 6, 6]
    ys = [2, 0, 7, 7, 7, 5, 1, 3, 9, 2, 4, 8]
    rows = [("a", i, x) for i, x in enumerate(xs)]
    rows += [("b", i, y) for i, y in enumerate(ys)]
    out = kendall_finish(
        source_kendall_counts(_tier(spark, rows))
    ).collect()[0]
    assert abs(out["tau_b"] - _ref_tau_b(xs, ys)) < 1e-12


def test_kendall_perfect_and_reversed(spark):
    xs = [1, 2, 3, 4, 5]
    row = _run(spark, xs, xs)
    assert row["nc"] == 10 and row["nd"] == 0
    row = _run(spark, xs, list(reversed(xs)))
    assert row["nc"] == 0 and row["nd"] == 10


def test_kendall_constant_side_is_all_ties(spark):
    xs = [1, 2, 3, 4]
    ys = [7, 7, 7, 7]
    row = _run(spark, xs, ys)
    assert row["nc"] == 0 and row["nd"] == 0
    assert row["tie_y"] == 6 and row["tie_x"] == 0 and row["tie_xy"] == 0
    # tau-b is undefined (zero variance) -> NULL, not a crash
    rows = [("a", i, x) for i, x in enumerate(xs)]
    rows += [("b", i, y) for i, y in enumerate(ys)]
    out = kendall_finish(
        source_kendall_counts(_tier(spark, rows))
    ).collect()[0]
    assert out["tau_b"] is None


def test_kendall_monotone_transform_invariance(spark):
    # tau depends only on order: x -> x**3 must not change it
    xs = [3, 1, 4, 1, 5, 9, 2, 6]
    ys = [2, 7, 1, 8, 2, 8, 1, 8]
    rows_a = [("a", i, x) for i, x in enumerate(xs)]
    rows_b = [("b", i, y) for i, y in enumerate(ys)]
    base = _tier(spark, rows_a + rows_b)
    cubed = _tier(
        spark,
        [("a", i, x ** 3) for i, x in enumerate(xs)] + rows_b,
    )
    t1 = kendall_finish(source_kendall_counts(base)).collect()[0]["tau_b"]
    t2 = kendall_finish(source_kendall_counts(cubed)).collect()[0]["tau_b"]
    assert abs(t1 - t2) < 1e-15


def test_kendall_max_buckets_guard(spark):
    # pair (a,b) shares 8 buckets, pair (a,c) shares 3: a cap of 4
    # drops the wide pair BEFORE the triangular self-join and keeps
    # the narrow one bit-identical to the uncapped run
    import pytest

    xs = [3, 1, 4, 1, 5, 9, 2, 6]
    rows = [("a", i, x) for i, x in enumerate(xs)]
    rows += [("b", i, x + 1) for i, x in enumerate(xs)]
    rows += [("c", i, 7 - x) for i, x in enumerate(xs[:3])]
    tier = _tier(spark, rows)
    capped = {
        (r["source_a"], r["source_b"]): r
        for r in source_kendall_counts(tier, max_buckets=4).collect()
    }
    assert set(capped) == {("a", "c"), ("b", "c")}
    full = {
        (r["source_a"], r["source_b"]): r
        for r in source_kendall_counts(tier).collect()
    }
    assert ("a", "b") in full
    for k, r in capped.items():
        assert tuple(r) == tuple(full[k])
    with pytest.raises(ValueError):
        source_kendall_counts(tier, max_buckets=1)
