"""Per-source retention policy and hysteresis threshold alerting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _tier(spark, rows):
    return spark.createDataFrame(
        rows, "source string, bucket_s long, cnt long, sum_n_tok long, "
        "min_n_tok long, max_n_tok long"
    )


def test_retention_policy_per_source(spark):
    from pyreshaper_spark.operators.rollup import apply_retention_policy

    rows = [
        ("a", b, 1, 10, 1, 1) for b in (0, 600, 1200, 1800)
    ] + [
        ("b", b, 1, 10, 1, 1) for b in (0, 600, 1200, 1800)
    ] + [
        ("c", b, 1, 10, 1, 1) for b in (0, 600, 1200, 1800)
    ]
    t = _tier(spark, rows)
    out = apply_retention_policy(
        t, 600, {"a": 1, "b": 3}, default_buckets=2
    )
    got = {
        (r["source"], r["bucket_s"]) for r in out.collect()
    }
    # high-water = 1800: a keeps 1 bucket, b keeps 3, c (default) 2
    assert got == {
        ("a", 1800),
        ("b", 600), ("b", 1200), ("b", 1800),
        ("c", 1200), ("c", 1800),
    }
    # None default keeps unlisted sources forever
    out2 = apply_retention_policy(t, 600, {"a": 1})
    assert out2.filter(F.col("source") == "c").count() == 4
    assert out2.filter(F.col("source") == "a").count() == 1


def test_retention_policy_matches_global(spark, seq):
    """Empty policy + default ≡ the single global TTL operator."""
    from pyreshaper_spark.operators.rollup import (
        apply_retention,
        apply_retention_policy,
        rollup_tier0,
    )

    t = rollup_tier0(seq, 3600)
    a = {tuple(r) for r in apply_retention(t, 3600, 24).collect()}
    b = {
        tuple(r)
        for r in apply_retention_policy(
            t, 3600, {}, default_buckets=24
        ).collect()
    }
    assert a == b


def test_alert_hysteresis_hand_fixture(spark):
    from pyreshaper_spark.operators.gapfill import alert_hysteresis

    vals = [
        (0, 50),     # dead band from initial state 0 -> stays 0
        (600, 80),   # >= hi -> fire
        (1200, 60),  # dead band -> holds 1 (no flap)
        (1800, 40),  # <= lo -> clear
        (2400, 65),  # dead band -> holds 0
        (3000, 90),  # fire again
    ]
    t = _tier(spark, [("s", b, 1, v, 1, 1) for b, v in vals])
    out = sorted(
        alert_hysteresis(t, hi=70, lo=40).collect(),
        key=lambda r: r["bucket_s"],
    )
    assert [r["alert"] for r in out] == [0, 1, 1, 0, 0, 1]
    assert [r["event"] for r in out] == [
        None, "fire", None, "clear", None, "fire",
    ]


def test_alert_hysteresis_invariants_real(spark, seq):
    from pyreshaper_spark.operators.gapfill import alert_hysteresis
    from pyreshaper_spark.operators.rollup import rollup_tier0

    hi, lo = 70, 40
    out = alert_hysteresis(rollup_tier0(seq, 600), hi=hi, lo=lo)
    # transitions only where the value actually crossed the band edge
    assert out.filter(
        (F.col("event") == "fire") & (F.col("value") < hi)
    ).count() == 0
    assert out.filter(
        (F.col("event") == "clear") & (F.col("value") > lo)
    ).count() == 0
    # dead-band rows never change state
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("bucket_s")
    flap = (
        out.withColumn("prev", F.lag("alert").over(w))
        .filter(
            (F.col("value") > lo) & (F.col("value") < hi)
            & F.col("prev").isNotNull()
            & (F.col("alert") != F.col("prev"))
        )
    )
    assert flap.count() == 0
    # both states occur on the fixture (thresholds bind)
    states = {r["alert"] for r in out.select("alert").distinct().collect()}
    assert states == {0, 1}


def test_alert_hysteresis_rejects_inverted_band(spark):
    from pyreshaper_spark.operators.gapfill import alert_hysteresis

    with pytest.raises(ValueError):
        alert_hysteresis(_tier(spark, []), hi=10, lo=20)
