"""As-of join + per-series top-k — time-series query surface.

``asof_join`` attaches, to every left-side (source, bucket) row, the
most recent right-side row with ``bucket_r <= bucket`` in the same
source (TimescaleDB/kdb "as-of" semantics; the reference has no joins
at all — this is graft surface for querying across retention tiers,
e.g. annotating a 10-minute tier with the last closed 1-hour rollup).

Implementation is the scalable union–sort–window trick, NOT a range
join: tag right rows 0 / left rows 1, union, and LOCF the right
payload over a window ordered by (bucket, tag). One shuffle on
source, no O(n·m) range comparison, no skew beyond what the source
key already has. The DuckDB oracle uses its native ``ASOF JOIN``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    value_cols: tuple[str, ...],
    key: str = "source",
    time_col: str = "bucket_s",
    direction: str = "backward",
    tolerance_s: int | None = None,
) -> DataFrame:
    """Left rows + latest right ``value_cols`` as of each left time.

    ``left`` keeps all its columns; right values arrive as
    ``asof_<col>`` (null when no right row matches).

    ``direction``: "backward" (default — most recent right row with
    ``t_r <= t``, the TimescaleDB/kdb default), "forward" (earliest
    right row with ``t_r >= t``), or "nearest" (the closer of the two
    by ``|t - t_r|``, backward winning exact-distance ties — the full
    pandas ``merge_asof`` direction surface, deterministic tie rule).
    ``tolerance_s``: maximum |t - t_r|; a match farther away than this
    yields nulls (pandas ``merge_asof(tolerance=...)``). For "nearest"
    the tolerance masks each side BEFORE the distance pick, so a
    too-far backward row never shadows an in-window forward row.

    All left columns ride THROUGH the union (right rows carry nulls), so
    the result needs no join back onto ``left`` — one shuffle total, and
    duplicate (key, time) rows on the left each keep exactly one output
    row (the old join-back produced k×k rows for k duplicates). The
    forward direction is the same window over the REVERSED time order;
    "nearest" evaluates BOTH carries over the one exchange (same
    partition key — Catalyst plans one shuffle and two sorts);
    tolerance rides as one extra carried column (the matched right
    time), masked in the final projection — no extra shuffle for
    any option."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "direction must be 'backward', 'forward' or 'nearest'"
        )
    payload = [c for c in left.columns if c not in (key, time_col)]
    # The matched right ROW is carried as ONE struct (time + values),
    # never as independent per-column last(ignorenulls) streams: with
    # per-column carries a NULL value in the matched row silently falls
    # back to an OLDER row's value — breaking as-of row semantics (the
    # DuckDB/pandas answer is "the matched row's value, NULL included")
    # and, with tolerance, mixing a value from outside the window with
    # a matched time inside it. The struct itself is non-null on every
    # right row, so last(ignorenulls) skips exactly the left rows.
    row_fields = [F.col(time_col).alias("_asof_t"),
                  *[F.col(c).alias(f"asof_{c}") for c in value_cols]]
    row_type = T.StructType(
        [T.StructField("_asof_t", right.schema[time_col].dataType)]
        + [T.StructField(f"asof_{c}", right.schema[c].dataType)
           for c in value_cols]
    )
    l_tag = left.select(
        key, time_col, F.lit(1).alias("_tag"), *payload,
        F.lit(None).cast(row_type).alias("_asof_row"),
    )
    r_tag = right.select(
        key, time_col, F.lit(0).alias("_tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in payload],
        F.struct(*row_fields).alias("_asof_row"),
    )
    u = l_tag.unionByName(r_tag)

    # right rows sort BEFORE left rows at equal time (tag 0 < 1), so a
    # same-bucket right row is visible to the left row — asof <= / >=
    def _carry(desc: bool):
        order = (
            [F.col(time_col).desc(), F.col("_tag").asc()]
            if desc
            else [F.col(time_col).asc(), F.col("_tag").asc()]
        )
        w = (
            Window.partitionBy(key)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last("_asof_row", ignorenulls=True).over(w)

    def _mask_tol(matched):
        if tolerance_s is None:
            return matched
        in_tol = (
            matched.isNotNull()
            & (F.abs(F.col(time_col) - matched["_asof_t"]) <= tolerance_s)
        )
        return F.when(in_tol, matched)

    if direction == "nearest":
        picked = u.select(
            key, time_col, "_tag", *payload,
            _carry(desc=False).alias("_b_row"),
            _carry(desc=True).alias("_f_row"),
        ).filter(F.col("_tag") == 1)
        b = _mask_tol(F.col("_b_row"))
        f = _mask_tol(F.col("_f_row"))
        # distances are non-negative by construction of each carry;
        # backward wins exact-distance ties (documented rule)
        bd = F.col(time_col) - b["_asof_t"]
        fd = f["_asof_t"] - F.col(time_col)
        matched = (
            F.when(b.isNull(), f)
            .when(f.isNull(), b)
            .when(bd <= fd, b)
            .otherwise(f)
        )
    else:
        picked = u.select(
            key, time_col, "_tag", *payload,
            _carry(desc=(direction == "forward")).alias("_asof_row"),
        ).filter(F.col("_tag") == 1)
        matched = _mask_tol(F.col("_asof_row"))
    return picked.select(
        *left.columns,
        *[matched[f"asof_{c}"].alias(f"asof_{c}") for c in value_cols],
    )


def asof_join_sql(
    left_cte: str,
    right_cte: str,
    value_cols: tuple[str, ...],
    left_cols: tuple[str, ...],
    key: str = "source",
    time_col: str = "bucket_s",
    direction: str = "backward",
    tolerance_s: int | None = None,
) -> str:
    """DuckDB rendering using native ASOF LEFT JOIN over two relations
    (names of CTEs the caller has defined). DuckDB's ASOF picks the
    nearest match for either inequality direction; tolerance is a CASE
    mask over the matched right time, mirroring the Spark operator.
    "nearest" composes TWO native ASOF joins (backward + forward) and
    picks per row by masked distance, backward winning ties — the same
    rule as the Spark operator."""
    lcols = ", ".join(f"l.{c}" for c in left_cols)
    if direction == "nearest":
        tol_b = (
            f" AND l.{time_col} - rb.{time_col} <= {tolerance_s}"
            if tolerance_s is not None else ""
        )
        tol_f = (
            f" AND rf.{time_col} - l.{time_col} <= {tolerance_s}"
            if tolerance_s is not None else ""
        )
        # masked distances; NULL = that side unusable
        bd = f"(CASE WHEN rb.{time_col} IS NOT NULL{tol_b} " \
             f"THEN l.{time_col} - rb.{time_col} END)"
        fd = f"(CASE WHEN rf.{time_col} IS NOT NULL{tol_f} " \
             f"THEN rf.{time_col} - l.{time_col} END)"
        use_b = f"({bd} IS NOT NULL AND ({fd} IS NULL OR {bd} <= {fd}))"
        use_f = f"({fd} IS NOT NULL AND ({bd} IS NULL OR {fd} < {bd}))"
        vals = ", ".join(
            f"CASE WHEN {use_b} THEN rb.{c} "
            f"WHEN {use_f} THEN rf.{c} END AS asof_{c}"
            for c in value_cols
        )
        return f"""
SELECT {lcols}, {vals}
FROM {left_cte} l
ASOF LEFT JOIN {right_cte} rb
  ON l.{key} = rb.{key} AND l.{time_col} >= rb.{time_col}
ASOF LEFT JOIN {right_cte} rf
  ON l.{key} = rf.{key} AND l.{time_col} <= rf.{time_col}
"""
    op = ">=" if direction == "backward" else "<="
    if tolerance_s is None:
        vals = ", ".join(f"r.{c} AS asof_{c}" for c in value_cols)
    else:
        vals = ", ".join(
            f"CASE WHEN r.{time_col} IS NOT NULL AND "
            f"abs(l.{time_col} - r.{time_col}) <= {tolerance_s} "
            f"THEN r.{c} END AS asof_{c}"
            for c in value_cols
        )
    return f"""
SELECT {lcols}, {vals}
FROM {left_cte} l
ASOF LEFT JOIN {right_cte} r
  ON l.{key} = r.{key} AND l.{time_col} {op} r.{time_col}
"""


def topk_per_series(
    tier: DataFrame, k: int = 3, order_col: str = "sum_n_tok"
) -> DataFrame:
    """Top-k buckets per source by ``order_col`` (deterministic
    tie-break on bucket). Window row_number — one shuffle, no global
    sort; at scale this is the standard grouped top-k."""
    w = Window.partitionBy("source").orderBy(
        F.col(order_col).desc(), F.col("bucket_s").asc()
    )
    return (
        tier.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("source", "bucket_s", order_col, "rank")
    )


def topk_per_series_sql(
    tier_cte: str, k: int = 3, order_col: str = "sum_n_tok"
) -> str:
    return f"""
SELECT source, bucket_s, {order_col}, rank FROM (
  SELECT source, bucket_s, {order_col},
         row_number() OVER (PARTITION BY source
                            ORDER BY {order_col} DESC, bucket_s ASC) AS rank
  FROM {tier_cte})
WHERE rank <= {k}
"""
