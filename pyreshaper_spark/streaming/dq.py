"""Streaming data-quality monitor — the streaming face of
``operators.checks.check_suite``.

A release gate checks the corpus once; an INGEST pipeline wants the
same rule suite as a continuously-updated counter table ("how many
contract violations so far, is the feed still clean?") so a bad
upstream deploy is caught while it streams, not at the next release.

Every ``cond`` rule is a streaming-safe running sum, so the whole
suite is ONE unbounded global aggregate in complete output mode —
per-rule state is a single counter, O(rules) state total regardless of
stream length, and Spark's partial aggregation collapses each
micro-batch map-side exactly as the batch plan does. ``unique`` rules
need cross-row distinct state proportional to the key cardinality —
unbounded in a stream — so they are REJECTED here with a pointer to
the batch gate (the same reasoning that makes streaming
``dropDuplicates`` without a watermark unusable at 10^12 rows).

With static input run under ``availableNow``, the final counter row
must equal the batch ``check_suite`` on the same relation minus its
``unique`` rules — the full value-hash oracle the driver checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pyreshaper_spark.operators.checks import (
    Rule,
    _validate_rules,
    suite_aggs,
    suite_rows,
)


def streaming_rules(rules: list[Rule]) -> list[Rule]:
    """The streamable subset of a suite (cond rules only)."""
    return [r for r in rules if r.distinct_col is None]


def streaming_dq(stream: DataFrame, rules: list[Rule]) -> DataFrame:
    """stream → 1-row wide running counters (_n, _v0.._vk), complete
    output mode. Explode to per-rule verdicts at read time with
    :func:`dq_verdicts` (a generator is not a streaming-agg follower).
    """
    _validate_rules(rules)
    bad = [r.name for r in rules if r.distinct_col is not None]
    if bad:
        raise ValueError(
            f"unique rules need unbounded distinct state in a stream "
            f"— run them in the batch release gate instead: {bad}"
        )
    return stream.agg(*suite_aggs(rules))


def dq_verdicts(
    wide_row: DataFrame, rules: list[Rule], keys: tuple[str, ...] = ()
) -> DataFrame:
    """Per-rule (…, rule, violations, n_rows, passed) from the
    materialized counter row(s), carrying any group keys."""
    return suite_rows(wide_row, rules, keys)


def streaming_dq_by(
    stream: DataFrame,
    rules: list[Rule],
    keys: tuple[str, ...] = ("source",),
) -> DataFrame:
    """The keyed monitor — running counters per feed (update mode, one
    wide row per group): a bad upstream deploy shows up against ITS
    source the moment it streams, not as an anonymous global bump.
    State is O(rules · |groups|). Same streamability rule: ``unique``
    needs unbounded distinct state and is rejected."""
    _validate_rules(rules)
    bad = [r.name for r in rules if r.distinct_col is not None]
    if bad:
        raise ValueError(
            f"unique rules need unbounded distinct state in a stream "
            f"— run them in the batch release gate instead: {bad}"
        )
    return stream.groupBy(*keys).agg(*suite_aggs(rules))
