"""Hypothesis fuzz of check_suite against a pure-pandas reference:
per-rule violation counts and verdicts over random frames with nulls,
duplicates, negatives, empty strings, and non-matching categories."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

row_strategy = st.tuples(
    st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),  # doc_id
    st.one_of(st.none(), st.sampled_from(["", "a", "hello", "src1"])),
    st.sampled_from(["en", "de", "xx", "zz"]),                     # lang
)
frame_strategy = st.lists(row_strategy, min_size=0, max_size=25)


def _ref_counts(rows):
    """Pure-Python recompute of every rule in the fuzz suite."""
    n = len(rows)
    ids = [r[0] for r in rows]
    texts = [r[1] for r in rows]
    langs = [r[2] for r in rows]
    nonnull_ids = [i for i in ids if i is not None]
    return {
        "doc_id_not_null": sum(1 for i in ids if i is None),
        "doc_id_unique": len(nonnull_ids) - len(set(nonnull_ids)),
        "doc_id_bounds": sum(1 for i in nonnull_ids if i < 0 or i > 3),
        "text_not_null": sum(1 for t in texts if t is None),
        "text_length_min2": sum(
            1 for t in texts if t is not None and len(t) < 2
        ),
        "text_matches": sum(
            1
            for t in texts
            if t is not None and not re.search("^[a-z]+$", t)
        ),
        "lang_in_set": sum(
            1 for lg in langs if lg is not None and lg not in ("en", "de")
        ),
    }, n


@settings(max_examples=20, deadline=None)
@given(rows=frame_strategy)
def test_check_suite_matches_python_reference(spark, rows):
    from pyreshaper_spark.operators.checks import (
        bounds,
        check_suite,
        in_set,
        length_min,
        matches,
        not_null,
        unique,
    )

    df = spark.createDataFrame(
        rows, "doc_id int, text string, lang string"
    )
    suite = [
        not_null("doc_id"),
        unique("doc_id"),
        bounds("doc_id", lo=0, hi=3),
        not_null("text"),
        length_min("text", 2),
        matches("text", "^[a-z]+$"),
        in_set("lang", ["en", "de"]),
    ]
    got = {
        r["rule"]: (r["violations"], r["n_rows"], r["passed"])
        for r in check_suite(df, suite).collect()
    }
    want, n = _ref_counts(rows)
    assert {k: v[0] for k, v in got.items()} == want
    for k, v in got.items():
        assert v[1] == n
        assert v[2] == (v[0] == 0)
