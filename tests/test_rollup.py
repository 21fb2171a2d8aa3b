"""Tier rollup correctness — cascade exactness + DuckDB oracle parity
(FIXTURES.md F5; the reference's fidelity-golden recast)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyreshaper_spark.fixtures import seq_cte
from pyreshaper_spark.operators.rollup import (
    rollup_all_tiers,
    rollup_tier0,
)
from tests.conftest import ddb_rows_set, rows_set

WIDTHS = [60, 600, 3600, 86400]
COLS = ["source", "bucket_s", "cnt", "sum_n_tok", "min_n_tok", "max_n_tok"]


def _norm(df):
    return df.select(*(F.col(c).cast("long").alias(c) if c != "source" else c for c in COLS))


def test_tier0_matches_oracle(seq, ddb):
    tier = _norm(rollup_tier0(seq, 60))
    oracle = ddb_rows_set(
        ddb,
        f"""WITH {seq_cte('base')}
        SELECT source, (event_s//60)*60 AS bucket_s, count(*) AS cnt,
               CAST(sum(n_tok) AS BIGINT) AS sum_n_tok,
               CAST(min(n_tok) AS BIGINT) AS min_n_tok,
               CAST(max(n_tok) AS BIGINT) AS max_n_tok
        FROM sequences GROUP BY 1,2""",
        COLS,
    )
    assert rows_set(tier, COLS) == oracle


def test_cascade_equals_direct_aggregation(seq):
    """Tier k computed via the cascade == the same tier computed directly
    from raw — the exactness invariant that lets retention drop raw data."""
    tiers = rollup_all_tiers(seq, WIDTHS)
    for w in WIDTHS[1:]:
        direct = _norm(rollup_tier0(seq, w))
        cascaded = _norm(tiers[w])
        assert rows_set(cascaded, COLS) == rows_set(direct, COLS), f"width={w}"


def test_row_conservation(seq):
    """sum(cnt) over any tier == input row count (variable completeness)."""
    n = seq.count()
    tiers = rollup_all_tiers(seq, WIDTHS)
    for w, t in tiers.items():
        assert t.agg(F.sum("cnt")).collect()[0][0] == n, f"width={w}"


def test_tokens_pruned_from_rollup_scan(spark, seq, tmp_path_factory):
    """Against a STORED sequences table (the production shape), the
    aggregate path's parquet scan must not read the wide `tokens`
    column — Catalyst column pruning is load-bearing at 100 TB."""
    path = str(tmp_path_factory.mktemp("seqtbl") / "sequences")
    seq.write.mode("overwrite").parquet(path)
    stored = spark.read.parquet(path)
    plan = rollup_tier0(stored, 60)._jdf.queryExecution().executedPlan().toString()
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema, plan
    assert all("tokens" not in ln for ln in read_schema), read_schema


def test_retention_keeps_newest_buckets(spark, seq):
    from pyreshaper_spark.operators.rollup import apply_retention, rollup_tier0

    tier = rollup_tier0(seq, 3600)
    kept = apply_retention(tier, 3600, 24)
    hw = tier.agg(F.max("bucket_s")).collect()[0][0]
    rows = kept.select("bucket_s").distinct().collect()
    assert all(r["bucket_s"] > hw - 24 * 3600 for r in rows)
    assert 0 < kept.count() < tier.count()
    # idempotent: pruning a pruned tier changes nothing
    again = apply_retention(kept, 3600, 24)
    assert again.count() == kept.count()


def test_bucket_percentiles_match_numpy(seq):
    import numpy as np

    from pyreshaper_spark.operators.rollup import bucket_percentiles

    got = {
        (r["source"], r["bucket_s"]): (r["p25_n_tok"], r["p50_n_tok"], r["p75_n_tok"])
        for r in bucket_percentiles(seq, 3600).collect()
    }
    raw = seq.select(
        "source", ((F.col("event_s") / 3600).cast("long") * 3600).alias("b"), "n_tok"
    ).collect()
    groups: dict = {}
    for r in raw:
        groups.setdefault((r["source"], r["b"]), []).append(r["n_tok"])
    for k, vals in groups.items():
        v = np.array(sorted(vals), dtype=np.float64)
        exp = tuple(np.quantile(v, q) for q in (0.25, 0.5, 0.75))
        assert got[k] == exp, (k, got[k], exp)


def test_bucket_percentiles_approx_tracks_exact(seq):
    from pyreshaper_spark.operators.rollup import (
        bucket_percentiles,
        bucket_percentiles_approx,
    )

    exact = {(r["source"], r["bucket_s"]): r["p50_n_tok"]
             for r in bucket_percentiles(seq, 3600).collect()}
    approx = {(r["source"], r["bucket_s"]): r["p50_n_tok"]
              for r in bucket_percentiles_approx(seq, 3600).collect()}
    assert set(exact) == set(approx)
    for k in exact:
        # t-digest at high accuracy: within 5% of the exact median
        assert abs(approx[k] - exact[k]) <= max(0.05 * exact[k], 1.0), k


# --------------------------------------------------------------------------
# OHLC / histogram / NDV rollups
# --------------------------------------------------------------------------

OHLC_COLS = [
    "source", "bucket_s", "open_s", "open_n_tok",
    "close_s", "close_n_tok", "min_n_tok", "max_n_tok",
]


def test_ohlc_cascade_equals_direct(seq):
    """OHLC cascaded 1m→10m→1h equals OHLC computed directly at 1h —
    the packed-key min/max makes first/last associative."""
    from pyreshaper_spark.operators.rollup import (
        ohlc_cascade,
        ohlc_finish,
        rollup_ohlc,
    )

    t = rollup_ohlc(seq, 60)
    for w in (600, 3600):
        t = ohlc_cascade(t, w)
    cascaded = rows_set(ohlc_finish(t), OHLC_COLS)
    direct = rows_set(ohlc_finish(rollup_ohlc(seq, 3600)), OHLC_COLS)
    assert cascaded == direct


def test_ohlc_open_close_are_boundary_rows(seq):
    """open is the value at the bucket's earliest event (min n_tok on
    timestamp ties), close at its latest (max n_tok on ties)."""
    from pyreshaper_spark.operators.rollup import ohlc_finish, rollup_ohlc

    out = ohlc_finish(rollup_ohlc(seq, 3600))
    rows = seq.select(
        "source",
        ((F.col("event_s") / 3600).cast("long") * 3600).alias("bucket_s"),
        "event_s", "n_tok",
    ).collect()
    by_bucket: dict[tuple, list] = {}
    for r in rows:
        by_bucket.setdefault((r.source, r.bucket_s), []).append(
            (r.event_s, r.n_tok)
        )
    for r in out.collect():
        pts = sorted(by_bucket[(r.source, r.bucket_s)])
        assert (r.open_s, r.open_n_tok) == pts[0]
        assert (r.close_s, r.close_n_tok) == pts[-1]
        assert r.min_n_tok == min(p[1] for p in pts)
        assert r.max_n_tok == max(p[1] for p in pts)


def test_histogram_cascade_and_conservation(seq):
    """Re-binned/re-bucketed histogram equals the direct coarse one, and
    every input row lands in exactly one (bucket, bin) cell."""
    from pyreshaper_spark.operators.rollup import (
        bucket_histogram,
        histogram_cascade,
    )

    cols = ["source", "bucket_s", "bin_lo", "cnt"]
    fine = bucket_histogram(seq, 600, 25)
    casc = histogram_cascade(fine, 3600, 50)
    direct = bucket_histogram(seq, 3600, 50)
    assert rows_set(casc, cols) == rows_set(direct, cols)
    assert casc.agg(F.sum("cnt")).collect()[0][0] == seq.count()


def test_ndv_approx_error_bounded(seq):
    """HLL estimate within 3×rsd of the exact distinct count per group."""
    from pyreshaper_spark.operators.rollup import bucket_ndv, bucket_ndv_approx

    exact = {
        (r.source, r.bucket_s): r.ndv_n_tok
        for r in bucket_ndv(seq, 3600).collect()
    }
    for r in bucket_ndv_approx(seq, 3600, rsd=0.02).collect():
        e = exact[(r.source, r.bucket_s)]
        assert abs(r.ndv_n_tok - e) <= max(2, 0.06 * e), (r.source, r.bucket_s)


def test_tier_cube_margins_telescope(seq):
    """CUBE margins are sums of their detail cells: per-source margin,
    per-bucket margin, and the grand total must all reproduce the
    detail layer exactly (gid bitmask: 0 detail, 1 bucket margin,
    2 source margin, 3 grand total)."""
    from collections import defaultdict

    from pyreshaper_spark.operators.rollup import tier_cube

    rows = tier_cube(seq, 3600).collect()
    by_gid = defaultdict(list)
    for r in rows:
        by_gid[r["gid"]].append(r)
    detail = by_gid[0]
    src_sum, bkt_sum = defaultdict(int), defaultdict(int)
    tot = 0
    for r in detail:
        src_sum[r["source"]] += r["sum_n_tok"]
        bkt_sum[r["bucket_s"]] += r["sum_n_tok"]
        tot += r["sum_n_tok"]
    assert {r["source"]: r["sum_n_tok"] for r in by_gid[1]} == dict(src_sum)
    assert {r["bucket_s"]: r["sum_n_tok"] for r in by_gid[2]} == dict(bkt_sum)
    (grand,) = by_gid[3]
    assert grand["sum_n_tok"] == tot
    assert grand["source"] is None and grand["bucket_s"] is None
    # margin rows carry NULL keys only on the aggregated dimension
    assert all(r["bucket_s"] is None and r["source"] is not None
               for r in by_gid[1])
    assert all(r["source"] is None and r["bucket_s"] is not None
               for r in by_gid[2])


def test_ohlc_m4_unpack_exact_past_2_53(spark):
    """ADVICE r2 (low): unpacking event_s*2^31+n_tok with float `/`
    rounds the seconds component up by one once the key exceeds 2^53
    and n_tok is within ~256 of 2^31. shiftright must be exact."""
    from pyreshaper_spark.operators.rollup import (
        m4_finish, ohlc_finish, rollup_m4, rollup_ohlc,
    )

    ev, nt = 5_000_000, (1 << 31) - 1  # key ≈ 1.07e16 > 2^53
    df = spark.createDataFrame(
        [("s", ev, nt), ("s", ev + 1, nt)],
        "source string, event_s long, n_tok long",
    )
    o = ohlc_finish(rollup_ohlc(df, 3600)).collect()[0]
    assert (o["open_s"], o["open_n_tok"]) == (ev, nt)
    assert (o["close_s"], o["close_n_tok"]) == (ev + 1, nt)
    m = m4_finish(rollup_m4(df, 3600)).collect()[0]
    assert (m["first_s"], m["first_v"]) == (ev, nt)
    assert (m["last_s"], m["last_v"]) == (ev + 1, nt)
    assert m["min_v"] == nt and m["max_v"] == nt


def test_moments_finish_matches_numpy(spark):
    import numpy as np

    from pyreshaper_spark.operators.rollup import (
        bucket_moments, moments_finish,
    )

    vals = [3, 7, 7, 11, 42, 5, 9, 13, 2, 8]
    df = spark.createDataFrame(
        [("s", 10 + i, v) for i, v in enumerate(vals)],
        "source string, event_s long, n_tok long",
    )
    out = moments_finish(bucket_moments(df, 3600)).collect()[0]
    a = np.array(vals, dtype=float)
    m = a.mean()
    m2 = ((a - m) ** 2).mean()
    m3 = ((a - m) ** 3).mean()
    m4 = ((a - m) ** 4).mean()
    assert out["n"] == len(vals)
    assert abs(out["mean"] - m) < 1e-9
    assert abs(out["var"] - m2) < 1e-6
    assert abs(out["skew"] - m3 / m2 ** 1.5) < 1e-9
    assert abs(out["excess_kurtosis"] - (m4 / m2 ** 2 - 3)) < 1e-9


def test_bucket_moments_overflow_is_loud(spark):
    """Σx⁴ past decimal(38,0) must raise (like the DuckDB oracle), not
    ship a silent NULL rollup. Under Spark 4's ANSI default the sum
    itself throws ARITHMETIC_OVERFLOW; with ANSI off the sum nulls and
    the _moments_overflow_guard raise fires instead — either way the
    job fails loudly. 6 rows of n_tok near 2³¹ → Σx⁴ ≈ 1.3e38 > 10³⁸-1."""
    import pytest
    from pyspark.errors import PySparkException

    from pyreshaper_spark.operators.rollup import bucket_moments

    nt = (1 << 31) - 1
    bad = spark.createDataFrame(
        [("s", 100 + i, nt) for i in range(6)],
        "source string, event_s long, n_tok long",
    )
    with pytest.raises(
        PySparkException, match="overflowed decimal|ARITHMETIC_OVERFLOW"
    ):
        bucket_moments(bad, 3600).collect()
    # the guard path itself (ANSI off): sum nulls → raise_error fires
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        with pytest.raises(PySparkException, match="overflowed decimal"):
            bucket_moments(bad, 3600).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
    # 4 rows stay inside 10³⁸ — still exact, no raise
    ok = spark.createDataFrame(
        [("s", 100 + i, nt) for i in range(4)],
        "source string, event_s long, n_tok long",
    )
    row = bucket_moments(ok, 3600).collect()[0]
    assert int(row["s4"]) == 4 * nt ** 4


def test_slo_multiburn_fast_and_slow_windows(spark):
    """Alert fires only when BOTH trailing windows are burning: an
    isolated violation never alerts; a sustained run does. Buckets are
    RANGE (time) frames, so missing buckets shrink the counts."""
    from pyreshaper_spark.operators.rollup import slo_multiburn

    w = 3600
    rows = (
        # src a: lone spike at hour 3 — must not alert
        [("a", i * w, 100 if i == 3 else 10) for i in range(30)]
        # src b: hours 10..19 all violate — alerts once windows fill
        + [("b", i * w, 100 if 10 <= i < 20 else 10) for i in range(30)]
    )
    tier = spark.createDataFrame(
        rows, "source string, bucket_s long, sum_n_tok long"
    )
    out = slo_multiburn(
        tier, width_s=w, threshold=50,
        short_s=6 * w, long_s=24 * w, short_min=3, long_min=5,
    ).collect()
    alerts = {(r["source"], r["bucket_s"] // w) for r in out if r["alert"]}
    assert not any(s == "a" for s, _ in alerts)
    # b: bad_short ≥3 from hour 12; bad_long ≥5 from hour 14 → alerts 14..19
    assert alerts == {("b", h) for h in range(14, 20)}
    for r in out:  # alert ⊆ bad, and short count never exceeds long
        if r["alert"]:
            assert r["bad"] == 1
        assert r["bad_short"] <= r["bad_long"]


def test_ltob_downsample_picks_largest_triangle(spark):
    from pyreshaper_spark.operators.rollup import ltob_downsample

    # one source, hour bucket 0: EVENLY spaced 10m points, flat at 10
    # with a spike at 1200 — the spike's triangle dominates (uneven
    # spacing would let a long x-gap beat it; that is correct LTOB too,
    # but even spacing isolates the "visually dominant point" property)
    tier = spark.createDataFrame(
        [("s", 0, 10), ("s", 600, 10), ("s", 1200, 99), ("s", 1800, 10),
         ("s", 2400, 10), ("s", 3000, 10), ("s", 3600, 10), ("s", 4200, 11)],
        "source string, bucket_s long, sum_n_tok long",
    )
    got = {
        r["bucket_s"]: (r["sel_s"], r["sel_v"], r["area2"])
        for r in ltob_downsample(tier, 3600).collect()
    }
    assert got[0][0] == 1200 and got[0][1] == 99 and got[0][2] > 0
    # bucket 3600 holds the series tail: 3600 is interior, 4200 an edge
    assert got[3600][0] == 3600


def test_bucket_mode_deterministic_tiebreak(spark):
    from pyreshaper_spark.operators.rollup import bucket_mode

    seq = spark.createDataFrame(
        [("s", 10, 7), ("s", 20, 7), ("s", 30, 3), ("s", 40, 3),
         ("s", 50, 9)],
        "source string, event_s long, n_tok long",
    )
    r = bucket_mode(seq, 3600).collect()[0]
    # 7 and 3 tie at count 2 → smallest value wins
    assert (r["mode_val"], r["mode_cnt"]) == (3, 2)


def test_source_share_totals_and_ranks(spark):
    from pyreshaper_spark.operators.rollup import source_share

    tier = spark.createDataFrame(
        [("a", 0, 30), ("b", 0, 60), ("c", 0, 10), ("a", 86400, 5)],
        "source string, bucket_s long, sum_n_tok long",
    )
    rows = source_share(tier).collect()
    day0 = {r["source"]: r for r in rows if r["bucket_s"] == 0}
    assert all(r["bucket_total"] == 100 for r in day0.values())
    assert [day0[s]["rank"] for s in ("b", "a", "c")] == [1, 2, 3]
    d1 = [r for r in rows if r["bucket_s"] == 86400][0]
    assert (d1["bucket_total"], d1["rank"]) == (5, 1)


def test_calendar_cascade_equals_direct(spark, seq):
    """Calendar tiers (week/month) from the 1d tier equal the direct
    raw aggregation — boundary nesting makes the cascade exact — and
    pre-epoch events truncate backward (calendar floor, not toward 0)."""
    from pyreshaper_spark.operators.rollup import (
        calendar_cascade,
        calendar_rollup,
        rollup_tier0,
    )

    # spread the 7-day fixture across ~9 months so many boundaries bind
    from pyreshaper_spark.config import EPOCH0

    spread = seq.withColumn(
        "event_s", F.lit(EPOCH0) + (F.col("event_s") - F.lit(EPOCH0)) * 40
    )
    day = rollup_tier0(spread, 86400)
    for unit, min_rows in (("week", 21), ("month", 21),
                           ("quarter", 21), ("year", 20)):
        got = rows_set(calendar_cascade(day, unit))
        want = rows_set(calendar_rollup(spread, unit))
        assert got == want and len(got) >= min_rows, unit
    # pre-epoch: an event in Dec 1969 lands in the Dec-1969 month
    pre = spark.createDataFrame(
        [("d0", "s0", 5, -86400)],  # 1969-12-31
        "doc_id string, source string, n_tok int, event_s long",
    )
    row = calendar_rollup(pre, "month").collect()[0]
    import datetime as dt

    assert row["bucket_s"] == int(
        dt.datetime(1969, 12, 1, tzinfo=dt.timezone.utc).timestamp()
    )
    # week floor: 1970-01-01 is a Thursday; its week starts Mon Dec 29
    row = calendar_rollup(
        spark.createDataFrame(
            [("d0", "s0", 5, 3600)],
            "doc_id string, source string, n_tok int, event_s long",
        ),
        "week",
    ).collect()[0]
    assert row["bucket_s"] == int(
        dt.datetime(1969, 12, 29, tzinfo=dt.timezone.utc).timestamp()
    )


def test_bucket_trimmed_semantics(spark):
    from pyreshaper_spark.operators.rollup import bucket_trimmed

    import pytest as _pytest

    rows = [("d%02d" % i, "s0", v, 100)
            for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 1000])]
    seq = spark.createDataFrame(
        rows, "doc_id string, source string, n_tok int, event_s long"
    )
    # 10 rows, trim 10% each side -> drop n_tok=1 and the 1000 outlier
    out = bucket_trimmed(seq, 3600, 1, 10).collect()[0]
    assert (out["cnt_kept"], out["sum_kept"]) == (8, sum(range(2, 10)))
    assert (out["min_kept"], out["max_kept"]) == (2, 9)
    # small bucket: k = floor(3/10) = 0 keeps everything
    small = bucket_trimmed(seq.limit(3), 3600, 1, 10).collect()[0]
    assert small["cnt_kept"] == 3
    # degenerate trim fractions rejected
    with _pytest.raises(ValueError, match="trim fraction"):
        bucket_trimmed(seq, 3600, 1, 2)


def test_calendar_realtime_merge_straddle(spark, seq):
    """The month straddling the high-water mark merges partials from
    the materialized and tail legs into the exact full answer; empty
    legs are identities."""
    from pyreshaper_spark.config import EPOCH0
    from pyreshaper_spark.operators.rollup import (
        calendar_realtime_merge,
        calendar_rollup,
    )

    spread = seq.withColumn(
        "event_s", F.lit(EPOCH0) + (F.col("event_s") - F.lit(EPOCH0)) * 40
    )
    want = rows_set(calendar_rollup(spread, "month"))
    for off_days in (0, 150, 10_000):  # all-tail, mid-month, all-mat
        hw = EPOCH0 + off_days * 86400 + 1800
        mat = calendar_rollup(
            spread.filter(F.col("event_s") < hw), "month"
        )
        got = calendar_realtime_merge(
            mat, spread.filter(F.col("event_s") >= hw), "month"
        )
        assert rows_set(got) == want, off_days


def test_calendar_bucket_matches_datetime_fuzz(spark):
    """The integer civil-calendar arithmetic (_with_calendar_bucket)
    must equal Python's proleptic-Gregorian datetime truncation over a
    seeded ±200-year fuzz (leap years, century non-leaps, week
    alignment, pre-epoch), and must be INDEPENDENT of
    spark.sql.session.timeZone — re-checked under Pacific/Kiritimati
    (UTC+14), where date_trunc-based truncation would shift most
    instants into the wrong day/month."""
    import datetime as dt
    import random

    from pyreshaper_spark.operators.rollup import _with_calendar_bucket

    rng = random.Random(0xCA1)
    secs = [rng.randrange(-200 * 31557600, 200 * 31557600) for _ in range(300)]
    # adversarial instants: boundaries ± 1s around leap/century edges
    for y, m, d in [(2000, 3, 1), (1900, 3, 1), (2024, 2, 29),
                    (1970, 1, 1), (1969, 12, 31), (2000, 1, 1)]:
        b = int(dt.datetime(y, m, d, tzinfo=dt.timezone.utc).timestamp())
        secs += [b - 1, b, b + 1]

    def want(e: int, unit: str) -> int:
        t = dt.datetime.fromtimestamp(e, dt.timezone.utc)
        if unit == "week":
            d0 = t.date() - dt.timedelta(days=t.weekday())
        elif unit == "month":
            d0 = t.date().replace(day=1)
        elif unit == "quarter":
            d0 = t.date().replace(month=3 * ((t.month - 1) // 3) + 1, day=1)
        else:
            d0 = t.date().replace(month=1, day=1)
        return int(
            dt.datetime(d0.year, d0.month, d0.day,
                        tzinfo=dt.timezone.utc).timestamp()
        )

    df = spark.createDataFrame([(e,) for e in secs], "event_s long")
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in (old_tz, "Pacific/Kiritimati"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            for unit in ("week", "month", "quarter", "year"):
                got = {
                    r["event_s"]: r["bucket_s"]
                    for r in _with_calendar_bucket(
                        df, "event_s", unit
                    ).collect()
                }
                for e in secs:
                    assert got[e] == want(e, unit), (tz, unit, e)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_calendar_oracle_sql_timezone_independent():
    """calendar_rollup_sql must return UTC boundaries even when the
    DuckDB connection timezone is not UTC (regression: bare date_trunc
    on TIMESTAMPTZ truncates in the connection zone)."""
    import duckdb

    con = duckdb.connect()
    con.execute("SET TimeZone='America/New_York'")
    con.execute(
        "CREATE VIEW sequences AS SELECT 's0' AS source, "
        "1690000000 AS event_s, 7 AS n_tok"
    )
    from pyreshaper_spark.operators.rollup import calendar_rollup_sql

    row = con.execute(calendar_rollup_sql("month")).fetchone()
    assert row[1] == 1688169600  # 2023-07-01T00:00:00Z
