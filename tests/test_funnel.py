from __future__ import annotations

import datetime as dt

from pyreshaper_spark.operators.funnel import (
    cohort_retention,
    funnel,
    type_pivot,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    """rows: (user_id, minutes_after_t0, event_type)"""
    data = [
        (u, T0 + dt.timedelta(minutes=m), t) for u, m, t in rows
    ]
    return spark.createDataFrame(
        data, "user_id long, ts timestamp_ntz, event_type string"
    )


def test_funnel_ordering_and_dropoff(spark):
    ev = _events(spark, [
        # u1 completes in order
        (1, 0, "view"), (1, 5, "click"), (1, 9, "purchase"),
        # u2: click BEFORE view -> does not chain; depth 1
        (2, 3, "click"), (2, 4, "view"),
        # u3: view+click, no purchase -> depth 2
        (3, 0, "view"), (3, 1, "click"),
        # u4: never views -> absent from funnel output
        (4, 0, "purchase"),
    ])
    out = {r["user_id"]: r["depth"] for r in funnel(ev).collect()}
    assert out == {1: 3, 2: 1, 3: 2}


def test_funnel_within_window(spark):
    ev = _events(spark, [
        (1, 0, "view"), (1, 200, "click"),   # click 200 min after view
    ])
    assert funnel(ev).collect()[0]["depth"] == 2
    assert funnel(ev, within_s=3600).collect()[0]["depth"] == 1


def test_funnel_picks_earliest_chain(spark):
    ev = _events(spark, [
        (1, 10, "view"), (1, 2, "view"),           # t1 = min = 2min
        (1, 5, "click"), (1, 1, "click"),          # click@1 < t1: skip
    ])
    r = funnel(ev).collect()[0]
    assert r["t_2"] - r["t_1"] == 3 * 60 * 1_000_000  # click@5 chained


def test_cohort_retention_matrix(spark):
    day = 24 * 60
    ev = _events(spark, [
        (1, 0, "view"), (1, day, "view"), (1, 2 * day, "view"),
        (2, 0, "view"), (2, 2 * day, "view"),
        (3, day, "view"),
    ])
    got = {
        (r["cohort_day"], r["k_day"]): r["n_users"]
        for r in cohort_retention(ev).collect()
    }
    d0 = min(c for c, _ in got)  # epoch day of T0
    assert got == {
        (d0, 0): 2, (d0, 1): 1, (d0, 2): 2,
        (d0 + 1, 0): 1,
    }


def test_type_pivot_counts(spark):
    ev = _events(spark, [
        (1, 0, "view"), (2, 1, "view"), (1, 2, "click"),
        (1, 61, "error"),
    ])
    got = {r["bucket_s"]: r for r in type_pivot(ev, 3600).collect()}
    assert len(got) == 2
    b0, b1 = sorted(got)
    assert (got[b0]["n_view"], got[b0]["n_click"], got[b0]["n_error"],
            got[b0]["n_purchase"], got[b0]["n_signup"]) == (2, 1, 0, 0, 0)
    assert got[b1]["n_error"] == 1 and b1 - b0 == 3600
