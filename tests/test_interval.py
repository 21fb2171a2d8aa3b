"""Grid-bucketed interval join — semantics + the equi-join plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyreshaper_spark.operators.interval import interval_join


def _wins(spark, rows):
    return spark.createDataFrame(
        rows, "source string, start_s long, end_s long"
    )


def _facts(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, source string, event_s long"
    )


def test_interval_join_semantics(spark):
    wins = _wins(spark, [
        ("a", 1000, 5000),     # spans grid cells 0 and 1 at grid_w=3600
        ("a", 7200, 7260),     # sub-cell window
        ("b", 1000, 5000),     # other key — must not cross-match
    ])
    facts = _facts(spark, [
        ("d1", "a", 1000),     # start inclusive
        ("d2", "a", 4999),     # last second (and in cell 1 ≠ start's cell)
        ("d3", "a", 5000),     # end exclusive → no match
        ("d4", "a", 7259),     # inside the sub-cell window
        ("d5", "a", 999),      # before any window
        ("d6", "c", 2000),     # key with no windows
    ])
    got = {
        (r["doc_id"], r["start_s"])
        for r in interval_join(facts, wins, grid_w=3600).collect()
    }
    assert got == {("d1", 1000), ("d2", 1000), ("d4", 7200)}


def test_interval_join_overlapping_windows_emit_pairs(spark):
    """SQL semantics: a row inside two overlapping windows appears once
    per window."""
    wins = _wins(spark, [("a", 0, 100), ("a", 50, 150)])
    facts = _facts(spark, [("d", "a", 60)])
    rows = interval_join(facts, wins, grid_w=60).collect()
    assert sorted(r["start_s"] for r in rows) == [0, 50]


def test_interval_join_plans_as_equi_join(spark):
    """The point of the grid trick: the physical plan must be a hash /
    sort-merge EQUI join — never BroadcastNestedLoopJoin or a cartesian
    product (what the naive BETWEEN predicate would plan as)."""
    wins = _wins(spark, [("a", 0, 7200)])
    facts = _facts(spark, [("d", "a", 60)])
    plan = (
        interval_join(facts, wins, grid_w=3600)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" in plan  # an actual (equi) join is present
    # the join keys must include the grid cell, not the source alone —
    # that is what bounds per-row comparisons to windows overlapping
    # the row's cell (source-only keys = per-key O(rows × windows))
    assert "_cell" in plan.split("Join")[1].split("\n")[0]
    # and a KEYLESS range predicate really does degrade to a nested
    # loop — the shape the grid join exists to avoid
    naive = (
        facts.join(
            wins,
            (facts.event_s >= wins.start_s)
            & (facts.event_s < wins.end_s),
        )._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" in naive or "Cartesian" in naive
