"""streaming_topk state machine + token_movers brute force."""

from __future__ import annotations

import random
from collections import Counter

import pandas as pd

from pyreshaper_spark.streaming.topk import topk_fn

W = 3600


class _FakeState:
    def __init__(self):
        self._v, self.exists = None, False

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v, self.exists = v, True


def _run(batches, k=3, state=None):
    state = state or _FakeState()
    out = []
    for pdf in batches:
        got = list(topk_fn(W, k)(("s",), iter([pdf]), state))
        if got:
            out.extend(pd.concat(got).to_dict("records"))
    return out, state


def _pdf(rows):
    return pd.DataFrame(rows, columns=["source", "event_s", "token"])


def test_topk_emits_on_close_with_exact_order():
    rows = (
        [("s", 10, 7)] * 3 + [("s", 20, 5)] * 3 + [("s", 30, 9)] * 1
        + [("s", W + 1, 1)]  # closes bucket 0
    )
    out, st = _run([_pdf(rows)], k=2)
    # count ties (7 and 5 both x3) break by token ascending
    assert [(r["bucket_s"], r["token"], r["cnt"], r["rank"])
            for r in out] == [(0, 5, 3, 1), (0, 7, 3, 2)]
    toks, cnts, ob, late = st.get
    assert ob == W and late == 0 and dict(zip(toks, cnts)) == {1: 1}


def test_topk_counts_accumulate_across_batches():
    out, st = _run([_pdf([("s", 10, 4)] * 2), _pdf([("s", 20, 4)] * 2)])
    assert out == []  # bucket still open
    out2, _ = _run([_pdf([("s", W + 5, 4)])], state=st)
    assert [(r["token"], r["cnt"]) for r in out2] == [(4, 4)]


def test_topk_late_rows_dropped_and_counted():
    out, st = _run([_pdf([("s", W + 5, 1)]), _pdf([("s", 10, 2)] * 3)])
    assert out == []
    toks, cnts, ob, late = st.get
    assert ob == W and late == 3
    assert 2 not in dict(zip(toks, cnts))


def test_token_movers_brute_force(spark):
    from pyreshaper_spark.operators.vocab import (
        _LIFT_SCALE,
        token_movers,
    )

    rng = random.Random(23)
    day = 86400
    rows = [
        ("a", rng.randrange(0, 3 * day), rng.randint(0, 9))
        for _ in range(3000)
    ]
    tok = spark.createDataFrame(
        rows, "source string, event_s long, token long"
    )
    k, min_count = 4, 2
    counts = Counter(((e // day) * day, t) for _, e, t in rows)
    counts = {kk: c for kk, c in counts.items() if c >= min_count}
    want = {}
    for b in {b for b, _ in counts}:
        cands = []
        for (bb, t), c_cur in counts.items():
            if bb != b:
                continue
            c_prev = counts.get((b - day, t))
            if c_prev is None:
                continue
            cands.append(((c_cur * _LIFT_SCALE) // c_prev, t,
                          c_prev, c_cur))
        cands.sort(key=lambda x: (-x[0], x[1]))
        for rank, (lift, t, cp, cc) in enumerate(cands[:k], start=1):
            want[(b, t)] = (cp, cc, lift, rank)
    got = {
        (r["bucket_s"], r["token"]):
            (r["c_prev"], r["c_cur"], r["lift_k"], r["rank"])
        for r in token_movers(tok, day, k=k, min_count=min_count).collect()
    }
    assert got == want and len(got) > 0
