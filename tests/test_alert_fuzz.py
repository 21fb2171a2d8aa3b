"""Hypothesis fuzz of the hysteresis LOCF recursion against a direct
sequential state-machine simulation: the window-arithmetic telescoping
(state = last non-null crossing mark, initial 0) must equal running the
enter-at-hi / exit-at-lo automaton row by row, for arbitrary value
paths and bands — including values exactly AT the thresholds (both
engines resolve the degenerate hi == lo tie in favor of entering) and
adjacent transitions."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

values_strategy = st.lists(
    st.integers(min_value=0, max_value=10), min_size=1, max_size=30
)
band_strategy = st.tuples(
    st.integers(min_value=0, max_value=10),
    st.integers(min_value=0, max_value=10),
).map(lambda t: (min(t), max(t)))  # (lo, hi)


def _simulate(vals: list[int], hi: int, lo: int):
    """Direct automaton: returns [(alert, event)] per step."""
    out = []
    state = 0
    for v in vals:
        prev = state
        if v >= hi:
            state = 1
        elif v <= lo:
            state = 0
        event = None
        if state == 1 and prev == 0:
            event = "fire"
        elif state == 0 and prev == 1:
            event = "clear"
        out.append((state, event))
    return out


@settings(max_examples=25, deadline=None)
@given(vals=values_strategy, band=band_strategy)
def test_hysteresis_equals_sequential_automaton(spark, vals, band):
    lo, hi = band
    from pyreshaper_spark.operators.gapfill import alert_hysteresis

    rows = [
        ("s", i * 600, 1, v, v, v) for i, v in enumerate(vals)
    ]
    t = spark.createDataFrame(
        rows,
        "source string, bucket_s long, cnt long, sum_n_tok long, "
        "min_n_tok long, max_n_tok long",
    )
    got = sorted(
        alert_hysteresis(t, hi=hi, lo=lo).collect(),
        key=lambda r: r["bucket_s"],
    )
    want = _simulate(vals, hi, lo)
    assert [(r["alert"], r["event"]) for r in got] == want
