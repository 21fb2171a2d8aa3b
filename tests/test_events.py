"""Event-stream operators: rollup, sessionization, JSON extraction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyreshaper_spark.operators import events as EV
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def ev(spark):
    return spark.read.parquet(f"{SF_SMOKE}/events.parquet").cache()


def test_rollup_conserves_events(ev):
    r = EV.events_rollup(ev)
    assert r.agg(F.sum("cnt")).collect()[0][0] == ev.count()


def test_sessionize_gap_semantics(spark):
    rows = [
        (1, 100, "2024-01-01 00:00:00"),
        (2, 100, "2024-01-01 00:10:00"),   # same session (gap 600)
        (3, 100, "2024-01-01 01:00:00"),   # new session (gap 3000)
        (4, 200, "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_s string"
    ).withColumn("ts", F.to_timestamp("ts_s"))
    s = EV.sessionize(df)
    got = {(r["user_id"], r["session_idx"]): r["n_events"] for r in s.collect()}
    assert got == {(100, 1): 2, (100, 2): 1, (200, 1): 1}


def test_extract_props(ev):
    r = EV.extract_props(ev)
    assert r.filter(F.col("k").isNull()).count() == 0
    assert r.count() == ev.count()


def test_engagement_hist_conserves_users_and_days(ev):
    """Histogram mass: sum(n_users) == distinct users, and the weighted
    sum(n_days * n_users) == |distinct (user, day)|."""
    h = EV.events_engagement_hist(ev).collect()
    ud = ev.select(
        "user_id",
        F.expr(
            "CAST(unix_timestamp(ts) - pmod(unix_timestamp(ts), 86400)"
            " AS LONG)"
        ),
    ).distinct()
    assert sum(r["n_users"] for r in h) == ev.select("user_id").distinct().count()
    assert sum(r["n_days"] * r["n_users"] for r in h) == ud.count()


def test_transitions_step_count_and_closure(ev):
    """Every event except each user's first contributes exactly one
    step, and every from/to type occurs in the raw data."""
    t = EV.events_transitions(ev).collect()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n_steps"] for r in t) == ev.count() - n_users
    types = {r[0] for r in ev.select("event_type").distinct().collect()}
    assert {r["from_type"] for r in t} <= types
    assert {r["to_type"] for r in t} <= types


def test_interval_join_no_nested_loop_and_session_parity(spark, ev):
    """Range join: bucketed equi-join shape (no BroadcastNestedLoopJoin
    / CartesianProduct in the plan) and exact parity with sessionize's
    per-session counts and bounds."""
    import io
    from contextlib import redirect_stdout

    from pyreshaper_spark.operators.events import sessionize
    from pyreshaper_spark.operators.rangejoin import events_in_sessions

    joined = events_in_sessions(ev)
    buf = io.StringIO()
    with redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

    sess = {(r["user_id"], r["session_idx"]): (r["n_events"], r["first_ep"], r["last_ep"])
            for r in sessionize(ev).collect()}
    got = {(r["user_id"], r["session_idx"]): (r["n_joined"], r["min_ep"], r["max_ep"])
           for r in joined.collect()}
    assert got == sess
