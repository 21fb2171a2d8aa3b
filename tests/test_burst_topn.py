"""token_burst / token_simpson / top_sources semantics."""

import random
from fractions import Fraction

from pyreshaper_spark.operators.rollup import top_sources
from pyreshaper_spark.operators.vocab import token_burst, token_simpson


def _tok_df(spark, rows):
    return spark.createDataFrame(
        rows, "source string, event_s long, token long"
    )


def test_token_burst_flags_exact_lift(spark):
    # bucket 0: token 1 x6, token 2 x2; bucket 3600: token 1 x2,
    # token 2 x6; token 3 uniform background x2 per bucket
    rows = []
    rows += [("s", 10, 1)] * 6 + [("s", 20, 2)] * 2 + [("s", 30, 3)] * 2
    rows += [("s", 3610, 1)] * 2 + [("s", 3620, 2)] * 6 + [("s", 3630, 3)] * 2
    tok = _tok_df(spark, rows)
    got = {
        (r["bucket_s"], r["token"]): r["cnt"]
        for r in token_burst(tok, 3600, lift_num=3, lift_den=2,
                             min_count=2).collect()
    }
    # brute force with exact fractions
    from collections import Counter

    c = Counter((e // 3600 * 3600, t) for _, e, t in rows)
    nb = Counter(b for b, _ in c.elements())
    ct = Counter(t for _, t in c.elements())
    n = sum(c.values())
    want = {
        (b, t): cnt
        for (b, t), cnt in c.items()
        if cnt >= 2
        and Fraction(cnt, nb[b]) >= Fraction(3, 2) * Fraction(ct[t], n)
    }
    assert got == want
    # the bursting tokens are flagged, the uniform one is not
    assert (0, 1) in got and (3600, 2) in got
    assert (0, 3) not in got and (3600, 3) not in got


def test_token_burst_min_count_binds(spark):
    # a 1-occurrence token with infinite lift must be suppressed
    rows = [("s", 10, 1)] * 10 + [("s", 3610, 99)]
    tok = _tok_df(spark, rows)
    got = token_burst(tok, 3600, lift_num=1, lift_den=1,
                      min_count=2).collect()
    assert all(r["token"] != 99 for r in got)


def test_token_simpson_matches_fraction_reference(spark):
    rng = random.Random(0x51)
    rows = [
        (s, rng.randrange(7200), rng.randrange(5))
        for s in ("a", "b") for _ in range(200)
    ]
    tok = _tok_df(spark, rows)
    got = {
        (r["source"], r["bucket_s"]): (r["simpson_num"], r["simpson_den"])
        for r in token_simpson(tok, 3600).collect()
    }
    from collections import Counter

    groups: dict = {}
    for s, e, t in rows:
        groups.setdefault((s, e // 3600 * 3600), []).append(t)
    for key, ts in groups.items():
        c = Counter(ts)
        num = sum(v * (v - 1) for v in c.values())
        nn = len(ts)
        assert got[key] == (num, nn * (nn - 1)), key
    assert set(got) == set(groups)
    # all-same tokens → num == den (collision probability 1)
    one = _tok_df(spark, [("s", 1, 7)] * 5)
    r = token_simpson(one, 3600).collect()[0]
    assert r["simpson_num"] == r["simpson_den"] == 20


def test_top_sources_collapse_and_ties(spark):
    tier = spark.createDataFrame(
        [
            ("a", 0, 100), ("b", 0, 50), ("c", 0, 50), ("d", 0, 10),
            ("a", 3600, 5),
        ],
        "source string, bucket_s long, sum_n_tok long",
    )
    got = {
        (r["bucket_s"], r["label"]): (r["value"], r["n_sources"])
        for r in top_sources(tier, k=2).collect()
    }
    # tie at 50 broken by source asc: b wins rank 2; c+d fold
    assert got[(0, "a")] == (100, 1)
    assert got[(0, "b")] == (50, 1)
    assert got[(0, "(other)")] == (60, 2)
    assert (0, "c") not in got
    # k >= sources in a bucket → no (other) row there
    assert got[(3600, "a")] == (5, 1)
    assert (3600, "(other)") not in got
