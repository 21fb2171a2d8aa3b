"""Offline changepoint detection + non-parametric trend test over the
rollup tiers.

The online detectors live in :mod:`gapfill` (Page's CUSUM, the
two-window level-shift filter) — they stream a decision per bucket.
This module adds the OFFLINE segmentation faces a retention pipeline
wants when it audits a closed window:

* :func:`amoc_changepoint` — AMOC ("at most one change") mean-shift
  segmentation per (source, coarse bucket): the split of the fine-tier
  series that maximizes the between-segment variance reduction, i.e.
  the single-breakpoint special case of the binary-segmentation /
  PELT family (Killick et al. 2012, JASA) with the L2 cost. The
  classic gain at split t of n points is

      G(t) = n_l·n_r/(n_l+n_r) · (mean_l − mean_r)²
           = (S_l·n_r − S_r·n_l)² / (n_l·n_r·n)

  Everything is carried as exact integers: the numerator
  ``(S_l·n_r − S_r·n_l)²`` as decimal(38,0) and the denominator
  ``n_l·n_r·n`` as int64; the argmax over t is decided by exact
  cross-multiplication (``A_i·B_j`` vs ``A_j·B_i``), never by a float
  division, so Spark and the DuckDB oracle agree bit-for-bit.

* :func:`mann_kendall` — the Mann–Kendall trend test per (source,
  coarse bucket): S = Σ_{i<j} sign(v_j − v_i) over the time-ordered
  fine values, plus the tie-corrected variance in its exact
  18-scaled integer form

      18·Var(S) = n(n−1)(2n+5) − Σ_p t_p(t_p−1)(2t_p+5)

  (Mann 1945; Kendall 1975). S, the tie term, and 18·Var are all
  plain integers — consumers divide by 18 and take the normal
  approximation; the engine never ships a float.

Scale shape (both ops): the input is a TIER — O(sources × coarse
buckets × n_fine) rows, already tiny next to raw — and the pair /
candidate fan-out is a self-EQUI-join on (source, coarse bucket)
whose per-group width is the constant n_fine (≤ 24 for hours-in-day),
so each group contributes ≤ n_fine² rows. One hash aggregate follows;
no window over an unbounded partition, no cartesian, no raw scan.

Domain bound (documented, guarded loudly): AMOC's pre-square term
D = S_l·n_r − S_r·n_l must satisfy D²·max(B) ≤ 10^38−1 so BOTH the
stored gain AND the cross-multiplied comparison A_j·B_i fit
decimal(38,0) — the guard bound is therefore
floor(sqrt((10^38−1)/B_max)) with B_max = ⌊n/2⌋·⌈n/2⌉·n at
n = n_fine (≈1.7·10^17 for the 24-hours-in-a-day default, allowing
per-fine-bucket value sums to ~2.9·10^14 — far past any real
token-count tier). Exceeding it raises (ANSI throws on the
decimal(19,0) cast natively; non-ANSI hits an explicit raise_error
guard), never a silent NULL: a looser guard would let the comparison
overflow to NULL under non-ANSI and silently return several "best"
splits per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyreshaper_spark.operators.rollup import floor_sql, floor_to

def _amoc_d_bound(n_fine: int) -> int:
    """Loud-failure bound for the AMOC pre-square term D (module doc):
    largest |D| such that D²·B_max still fits decimal(38,0), where
    B_max = ⌊n/2⌋·⌈n/2⌉·n is the largest possible gain denominator."""
    import math

    b_max = (n_fine // 2) * (n_fine - n_fine // 2) * n_fine
    return math.isqrt((10**38 - 1) // b_max)


def _tier_points(
    tier: DataFrame, coarse_s: int, fine_s: int, value_col: str
) -> DataFrame:
    """(source, cb, x, v): fine-tier values indexed by their position
    inside the coarse bucket (x = fine index, 0-based)."""
    return tier.select(
        "source",
        floor_to(F.col("bucket_s"), coarse_s).alias("cb"),
        F.expr(f"pmod(bucket_s, {coarse_s}) div {fine_s}")
        .cast("int")
        .alias("x"),
        F.col(value_col).cast("long").alias("v"),
    )


def _points_sql(relation: str, coarse_s: int, fine_s: int,
                value_col: str) -> str:
    cb = floor_sql("bucket_s", coarse_s)
    return (
        f"SELECT source, {cb} AS cb, "
        f"(bucket_s - {cb}) // {fine_s} AS x, "
        f"CAST({value_col} AS BIGINT) AS v FROM {relation}"
    )


def amoc_changepoint(
    tier: DataFrame,
    coarse_s: int,
    fine_s: int,
    value_col: str = "sum_n_tok",
) -> DataFrame:
    """Best single mean-shift split per (source, coarse bucket).

    Returns one row per group with ≥ 2 fine points: ``(source,
    bucket_s, n_pts, cp_t, cp_x, gain_num, gain_den)`` where the left
    segment is the first ``cp_t`` time-ordered points, ``cp_x`` is the
    fine index of the LAST left point, and the gain G = gain_num /
    gain_den (gain_num = (S_l·n_r − S_r·n_l)², gain_den = n_l·n_r·n).
    Ties in gain resolve to the earliest split — deterministically on
    both engines.
    """
    assert coarse_s % fine_s == 0 and coarse_s // fine_s >= 2
    pts = _tier_points(tier, coarse_s, fine_s, value_col)
    from pyspark.sql import Window

    w_ord = Window.partitionBy("source", "cb").orderBy("x")
    w_all = Window.partitionBy("source", "cb")
    ranked = pts.select(
        "source",
        "cb",
        "x",
        F.row_number().over(w_ord).alias("t"),
        F.sum("v").over(w_ord).alias("s_l"),
        F.count("*").over(w_all).alias("n"),
        F.sum("v").over(w_all).alias("s_tot"),
    ).filter(F.col("t") < F.col("n"))
    n_l = F.col("t")
    n_r = F.col("n") - F.col("t")
    s_l = F.col("s_l").cast("decimal(19,0)")
    s_r = (F.col("s_tot") - F.col("s_l")).cast("decimal(19,0)")
    d = (s_l * n_r.cast("decimal(19,0)")
         - s_r * n_l.cast("decimal(19,0)")).alias("d")
    d_bound = _amoc_d_bound(coarse_s // fine_s)
    cand = ranked.select(
        "source", "cb", "x", "t", "n",
        d,
        (n_l * n_r * F.col("n")).cast("long").alias("b"),
    ).select(
        "source", "cb", "x", "t", "n", "b",
        # loud domain guard: D²·B_max must fit decimal(38,0) or the
        # argmax cross-multiply could overflow (NULL under non-ANSI)
        F.when(
            F.abs(F.col("d")) > F.lit(d_bound).cast("decimal(38,0)"),
            F.expr(
                f"raise_error('amoc_changepoint: |S_l*n_r - S_r*n_l| > "
                f"{d_bound} — value sums exceed the documented "
                f"decimal(38) comparison domain')"
            ).cast("decimal(38,0)"),
        )
        .otherwise(
            (F.col("d").cast("decimal(19,0)")
             * F.col("d").cast("decimal(19,0)")).cast("decimal(38,0)")
        )
        .alias("a"),
    )
    # exact rational argmax by cross-multiplication: candidate j beats
    # candidate i iff A_j/B_j > A_i/B_i (or equal gain, earlier split);
    # the anti-join keeps exactly the unbeaten (= best) candidate
    i = cand.alias("i")
    j = cand.alias("j")
    beats = (
        F.col("j.a") * F.col("i.b") > F.col("i.a") * F.col("j.b")
    ) | (
        (F.col("j.a") * F.col("i.b") == F.col("i.a") * F.col("j.b"))
        & (F.col("j.t") < F.col("i.t"))
    )
    best = i.join(
        j,
        (F.col("i.source") == F.col("j.source"))
        & (F.col("i.cb") == F.col("j.cb"))
        & beats,
        "left_anti",
    )
    return best.select(
        F.col("i.source").alias("source"),
        F.col("i.cb").cast("long").alias("bucket_s"),
        F.col("i.n").cast("long").alias("n_pts"),
        F.col("i.t").cast("long").alias("cp_t"),
        F.col("i.x").cast("long").alias("cp_x"),
        F.col("i.a").alias("gain_num"),
        F.col("i.b").alias("gain_den"),
    )


def amoc_changepoint_sql(
    relation: str,
    coarse_s: int,
    fine_s: int,
    value_col: str = "sum_n_tok",
) -> str:
    """DuckDB twin of :func:`amoc_changepoint` over a fine-tier
    relation carrying (source, bucket_s, value_col). Returns a CTE
    continuation + final SELECT — append after an open ``WITH …``
    list (leading comma supplied here)."""
    return f""",
pts AS ({_points_sql(relation, coarse_s, fine_s, value_col)}),
ranked AS (
  SELECT source, cb, x,
         row_number() OVER w AS t,
         sum(v) OVER w AS s_l,
         count(*) OVER (PARTITION BY source, cb) AS n,
         sum(v) OVER (PARTITION BY source, cb) AS s_tot
  FROM pts
  WINDOW w AS (PARTITION BY source, cb ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
cand0 AS (
  SELECT source, cb, x, t, n,
         (CAST(s_l AS HUGEINT) * (n - t)
          - CAST(s_tot - s_l AS HUGEINT) * t) AS d,
         CAST(t * (n - t) * n AS BIGINT) AS b
  FROM ranked WHERE t < n
),
cand AS (
  -- d*d spelled as a product: DuckDB's ^ is float pow, not exact
  SELECT source, cb, x, t, n, d * d AS a, b FROM cand0
),
best AS (
  SELECT i.* FROM cand i
  WHERE NOT EXISTS (
    SELECT 1 FROM cand j
    WHERE j.source = i.source AND j.cb = i.cb
      AND (j.a * i.b > i.a * j.b
           OR (j.a * i.b = i.a * j.b AND j.t < i.t))
  )
)
SELECT source,
       CAST(cb AS BIGINT) AS bucket_s,
       CAST(n AS BIGINT) AS n_pts,
       CAST(t AS BIGINT) AS cp_t,
       CAST(x AS BIGINT) AS cp_x,
       CAST(a AS DECIMAL(38,0)) AS gain_num,
       b AS gain_den
FROM best
"""


def mann_kendall(
    tier: DataFrame,
    coarse_s: int,
    fine_s: int,
    value_col: str = "sum_n_tok",
) -> DataFrame:
    """Mann–Kendall S statistic + exact 18-scaled tie-corrected
    variance per (source, coarse bucket); groups need ≥ 2 points.

    Output: (source, bucket_s, n_pts, s_stat, var18, trend) with
    trend ∈ {-1, 0, 1} = sign(S). Z-scores and p-values are consumer-
    side floats: z = (S ∓ 1) / sqrt(var18/18).
    """
    assert coarse_s % fine_s == 0 and coarse_s // fine_s >= 2
    pts = _tier_points(tier, coarse_s, fine_s, value_col)
    a = pts.select("source", "cb", F.col("x").alias("xa"),
                   F.col("v").alias("va"))
    b = pts.select("source", "cb", F.col("x").alias("xb"),
                   F.col("v").alias("vb"))
    sgn = (
        F.when(F.col("vb") > F.col("va"), F.lit(1))
        .when(F.col("vb") < F.col("va"), F.lit(-1))
        .otherwise(F.lit(0))
    )
    s = (
        a.join(b, ["source", "cb"])
        .filter(F.col("xb") > F.col("xa"))
        .groupBy("source", "cb")
        .agg(F.sum(sgn).cast("long").alias("s_stat"))
    )
    n_t = F.col("tp")
    ties = (
        pts.groupBy("source", "cb", "v")
        .agg(F.count("*").alias("tp"))
        .groupBy("source", "cb")
        .agg(
            F.sum(F.col("tp")).cast("long").alias("n_pts"),
            F.sum(n_t * (n_t - 1) * (2 * n_t + 5))
            .cast("long")
            .alias("tie18"),
        )
    )
    n = F.col("n_pts")
    return (
        s.join(ties, ["source", "cb"])
        .select(
            "source",
            F.col("cb").cast("long").alias("bucket_s"),
            "n_pts",
            "s_stat",
            (n * (n - 1) * (2 * n + 5) - F.col("tie18"))
            .cast("long")
            .alias("var18"),
            F.when(F.col("s_stat") > 0, F.lit(1))
            .when(F.col("s_stat") < 0, F.lit(-1))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("trend"),
        )
    )


def seasonal_mann_kendall(
    tier: DataFrame,
    period_s: int,
    fine_s: int,
    value_col: str = "sum_n_tok",
) -> DataFrame:
    """Seasonal Mann–Kendall (Hirsch & Slack 1984) per source over the
    WHOLE tier range: the MK statistic computed independently within
    each seasonal phase (same hour-of-day, same day-of-week, …) and
    summed — trend detection that a diurnal/weekly cycle cannot fake,
    the standard form for strongly seasonal series.

    Phase = (bucket_s mod period_s) / fine_s; within a phase the
    series is ordered by cycle (bucket_s div period_s). S' = Σ_g S_g
    and 18·Var(S') = Σ_g 18·Var(S_g) (phases are independent under
    the null) — all exact integers.

    Scale shape: the per-phase pair fan-out is an equi self-join on
    (source, phase) whose group width is the CYCLE COUNT (days in
    range for the hour-of-day default) — bounded by the retention
    window, exactly like :func:`rollup.hod_band`'s frame. Output is
    O(sources).
    """
    assert period_s % fine_s == 0 and period_s // fine_s >= 1
    pts = tier.select(
        "source",
        F.expr(f"pmod(bucket_s, {period_s}) div {fine_s}")
        .cast("int")
        .alias("ph"),
        floor_to(F.col("bucket_s"), period_s).alias("cyc"),
        F.col(value_col).cast("long").alias("v"),
    )
    a = pts.select("source", "ph", F.col("cyc").alias("ca"),
                   F.col("v").alias("va"))
    b = pts.select("source", "ph", F.col("cyc").alias("cb"),
                   F.col("v").alias("vb"))
    sgn = (
        F.when(F.col("vb") > F.col("va"), F.lit(1))
        .when(F.col("vb") < F.col("va"), F.lit(-1))
        .otherwise(F.lit(0))
    )
    s = (
        a.join(b, ["source", "ph"])
        .filter(F.col("cb") > F.col("ca"))
        .groupBy("source")
        .agg(F.sum(sgn).cast("long").alias("s_stat"))
    )
    n_t = F.col("tp")
    n_g = F.col("n_g")
    per_phase = (
        pts.groupBy("source", "ph", "v")
        .agg(F.count("*").alias("tp"))
        .groupBy("source", "ph")
        .agg(
            F.sum("tp").alias("n_g"),
            F.sum(n_t * (n_t - 1) * (2 * n_t + 5)).alias("tie18"),
        )
        .groupBy("source")
        .agg(
            F.sum("n_g").cast("long").alias("n_pts"),
            F.sum(
                n_g * (n_g - 1) * (2 * n_g + 5) - F.col("tie18")
            ).cast("long").alias("var18"),
        )
    )
    # LEFT join from the totals: a source whose every phase is a
    # singleton has no pairs (no s row) but still reports S = 0
    s0 = F.coalesce(F.col("s_stat"), F.lit(0)).cast("long")
    return per_phase.join(s, "source", "left").select(
        "source",
        "n_pts",
        s0.alias("s_stat"),
        "var18",
        F.when(s0 > 0, F.lit(1))
        .when(s0 < 0, F.lit(-1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("trend"),
    )


def seasonal_mann_kendall_sql(
    relation: str,
    period_s: int,
    fine_s: int,
    value_col: str = "sum_n_tok",
) -> str:
    """DuckDB twin of :func:`seasonal_mann_kendall` — CTE continuation
    + final SELECT (append after an open ``WITH …`` list)."""
    cyc = floor_sql("bucket_s", period_s)
    return f""",
pts AS (
  SELECT source,
         (((bucket_s % {period_s}) + {period_s}) % {period_s})
           // {fine_s} AS ph,
         {cyc} AS cyc,
         CAST({value_col} AS BIGINT) AS v
  FROM {relation}
),
s AS (
  SELECT a.source,
         CAST(sum(CASE WHEN b.v > a.v THEN 1
                       WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT)
           AS s_stat
  FROM pts a JOIN pts b
    ON a.source = b.source AND a.ph = b.ph AND b.cyc > a.cyc
  GROUP BY 1
),
perph AS (
  SELECT source, ph, sum(tp) AS n_g,
         sum(tp * (tp - 1) * (2 * tp + 5)) AS tie18
  FROM (SELECT source, ph, v, count(*) AS tp FROM pts GROUP BY 1, 2, 3)
  GROUP BY 1, 2
),
vv AS (
  SELECT source,
         CAST(sum(n_g) AS BIGINT) AS n_pts,
         CAST(sum(n_g * (n_g - 1) * (2 * n_g + 5) - tie18) AS BIGINT)
           AS var18
  FROM perph GROUP BY 1
)
SELECT vv.source, vv.n_pts,
       CAST(coalesce(s.s_stat, 0) AS BIGINT) AS s_stat, vv.var18,
       CAST(CASE WHEN coalesce(s.s_stat, 0) > 0 THEN 1
                 WHEN coalesce(s.s_stat, 0) < 0 THEN -1 ELSE 0 END
            AS INT) AS trend
FROM vv LEFT JOIN s ON s.source = vv.source
"""


def pettitt(
    tier: DataFrame,
    coarse_s: int,
    fine_s: int,
    value_col: str = "sum_n_tok",
) -> DataFrame:
    """Pettitt (1979) rank-based changepoint per (source, coarse
    bucket): the split t maximizing |U_t| with

        U_t = Σ_{i≤t} Σ_{j>t} sign(v_j − v_i)

    — the non-parametric complement of :func:`amoc_changepoint` (no
    mean/variance model, robust to outliers; the statistic under the
    no-change null has known Kendall-type tails). U_t is a plain
    integer, so unlike AMOC the argmax needs no cross-multiplication:
    one group-bounded window ranks (−|U|, t) and keeps rank 1 —
    earliest-split tie-break, deterministic on both engines.

    Mechanics: each ordered pair (i < j) contributes sign(v_j − v_i)
    to every U_t with i ≤ t < j. Rather than a per-pair range update,
    the pair's span explodes MAP-SIDE into its (j − i) candidate
    splits (``sequence(ta, tb-1)``) — the fan-out is bounded by
    n_fine³/4 per group (≤ 3.5k rows at n_fine = 24), then ONE hash
    aggregate per (source, cb, t). Same constant-width equi self-join
    scale shape as the rest of the module; no raw scan.

    Output: (source, bucket_s, n_pts, cp_t, cp_x, u_stat) — left
    segment = first cp_t points, u_stat signed (positive ⇒ the later
    segment sits higher — an upward shift).
    """
    assert coarse_s % fine_s == 0 and coarse_s // fine_s >= 2
    pts = _tier_points(tier, coarse_s, fine_s, value_col)
    from pyspark.sql import Window

    w_ord = Window.partitionBy("source", "cb").orderBy("x")
    w_all = Window.partitionBy("source", "cb")
    ranked = pts.select(
        "source", "cb", "x",
        F.row_number().over(w_ord).alias("t"),
        F.col("v"),
        F.count("*").over(w_all).alias("n"),
    )
    a = ranked.select(
        "source", "cb", F.col("t").alias("ta"), F.col("v").alias("va")
    )
    b = ranked.select(
        "source", "cb", F.col("t").alias("tb"), F.col("v").alias("vb")
    )
    sgn = (
        F.when(F.col("vb") > F.col("va"), F.lit(1))
        .when(F.col("vb") < F.col("va"), F.lit(-1))
        .otherwise(F.lit(0))
    )
    spans = (
        a.join(b, ["source", "cb"])
        .filter(F.col("tb") > F.col("ta"))
        .select(
            "source", "cb", sgn.alias("s"),
            F.explode(
                F.sequence(F.col("ta"), F.col("tb") - 1)
            ).alias("t"),
        )
    )
    u = spans.groupBy("source", "cb", "t").agg(
        F.sum("s").cast("long").alias("u")
    )
    sizes = ranked.groupBy("source", "cb").agg(F.max("n").alias("n"))
    xs = ranked.select("source", "cb", "t", "x")
    w_pick = Window.partitionBy("source", "cb").orderBy(
        F.abs(F.col("u")).desc(), F.col("t").asc()
    )
    best = (
        u.withColumn("rk", F.row_number().over(w_pick))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    return (
        best.join(sizes, ["source", "cb"])
        .join(xs, ["source", "cb", "t"])
        .select(
            "source",
            F.col("cb").cast("long").alias("bucket_s"),
            F.col("n").cast("long").alias("n_pts"),
            F.col("t").cast("long").alias("cp_t"),
            F.col("x").cast("long").alias("cp_x"),
            F.col("u").alias("u_stat"),
        )
    )


def pettitt_sql(
    relation: str,
    coarse_s: int,
    fine_s: int,
    value_col: str = "sum_n_tok",
) -> str:
    """DuckDB twin of :func:`pettitt` — CTE continuation + final
    SELECT (append after an open ``WITH …`` list)."""
    return f""",
pts AS ({_points_sql(relation, coarse_s, fine_s, value_col)}),
ranked AS (
  SELECT source, cb, x,
         row_number() OVER (PARTITION BY source, cb ORDER BY x) AS t,
         v,
         count(*) OVER (PARTITION BY source, cb) AS n
  FROM pts
),
spans AS (
  SELECT a.source, a.cb,
         CASE WHEN b.v > a.v THEN 1
              WHEN b.v < a.v THEN -1 ELSE 0 END AS s,
         unnest(generate_series(a.t, b.t - 1)) AS t
  FROM ranked a JOIN ranked b
    ON a.source = b.source AND a.cb = b.cb AND b.t > a.t
),
u AS (
  SELECT source, cb, t, CAST(sum(s) AS BIGINT) AS u
  FROM spans GROUP BY 1, 2, 3
),
best AS (
  SELECT source, cb, t, u,
         row_number() OVER (PARTITION BY source, cb
                            ORDER BY abs(u) DESC, t ASC) AS rk
  FROM u
)
SELECT b.source,
       CAST(b.cb AS BIGINT) AS bucket_s,
       CAST(r.n AS BIGINT) AS n_pts,
       CAST(b.t AS BIGINT) AS cp_t,
       CAST(r.x AS BIGINT) AS cp_x,
       b.u AS u_stat
FROM best b
JOIN ranked r ON r.source = b.source AND r.cb = b.cb AND r.t = b.t
WHERE b.rk = 1
"""


def mann_kendall_sql(
    relation: str,
    coarse_s: int,
    fine_s: int,
    value_col: str = "sum_n_tok",
) -> str:
    """DuckDB twin of :func:`mann_kendall` — CTE continuation + final
    SELECT (append after an open ``WITH …`` list)."""
    return f""",
pts AS ({_points_sql(relation, coarse_s, fine_s, value_col)}),
s AS (
  SELECT a.source, a.cb,
         CAST(sum(CASE WHEN b.v > a.v THEN 1
                       WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT)
           AS s_stat
  FROM pts a JOIN pts b
    ON a.source = b.source AND a.cb = b.cb AND b.x > a.x
  GROUP BY 1, 2
),
ties AS (
  SELECT source, cb,
         CAST(sum(tp) AS BIGINT) AS n_pts,
         CAST(sum(tp * (tp - 1) * (2 * tp + 5)) AS BIGINT) AS tie18
  FROM (SELECT source, cb, v, count(*) AS tp FROM pts GROUP BY 1, 2, 3)
  GROUP BY 1, 2
)
SELECT s.source,
       CAST(s.cb AS BIGINT) AS bucket_s,
       t.n_pts,
       s.s_stat,
       CAST(t.n_pts * (t.n_pts - 1) * (2 * t.n_pts + 5) - t.tie18
            AS BIGINT) AS var18,
       CAST(CASE WHEN s.s_stat > 0 THEN 1
                 WHEN s.s_stat < 0 THEN -1 ELSE 0 END AS INT) AS trend
FROM s JOIN ties t ON s.source = t.source AND s.cb = t.cb
"""
