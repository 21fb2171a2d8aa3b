"""Scalable interval (range) join — grid-bucketed equi-join.

Labeling fact rows with the variable-length time window that contains
them (`t >= start AND t < end`) is the one join shape Catalyst cannot
plan well from the naive predicate: a keyless range condition gives
BroadcastNestedLoopJoin / cartesian (every row × every window), and
even with a key equality Spark plans sort-merge ON THE KEY with the
range as a residual — every fact of a key is compared against EVERY
window of that key (O(rows_per_key × windows_per_key), and the hottest
key bounds the stage). Neither survives 10^12 fact rows.

The scale answer (the same trick as Iceberg/Photon range-join hints and
the classic GIS grid join): explode each window into the fixed-width
grid cells it overlaps, join facts to cells with a pure EQUI-join on
(key, cell) — hash/sort-merge, partial-agg friendly, skew-salted if
needed — and re-check the exact interval predicate as a residual
filter. With window length ≤ L the fan-out is ≤ L/grid + 1 cell rows
per window, a constant; every comparison the residual filter performs
is against a window that genuinely overlaps the row's cell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    windows: DataFrame,
    grid_w: int,
    time_col: str = "event_s",
    key: str = "source",
) -> DataFrame:
    """Inner-join ``left`` rows to the window(s) containing their time.

    ``windows`` carries (key, start_s, end_s) with end EXCLUSIVE.
    Overlapping windows emit one output row per (row, window) pair —
    SQL semantics; disjoint windows label each row at most once. Rows
    in no window are dropped (inner join). ``grid_w`` is the bucketing
    granularity: pick it near the typical window length so fan-out
    stays O(1) per window.
    """
    cells = F.sequence(
        (F.col("start_s") / grid_w).cast("long"),
        ((F.col("end_s") - 1) / grid_w).cast("long"),
    )
    w = windows.select(
        key,
        F.col("start_s").cast("long").alias("start_s"),
        F.col("end_s").cast("long").alias("end_s"),
        F.explode(cells).alias("_cell"),
    )
    lhs = left.withColumn(
        "_cell", (F.col(time_col) / grid_w).cast("long")
    )
    return (
        lhs.join(w, [key, "_cell"], "inner")
        .filter(
            (F.col(time_col) >= F.col("start_s"))
            & (F.col(time_col) < F.col("end_s"))
        )
        .drop("_cell")
    )


def interval_join_sql(
    left_cte: str,
    windows_cte: str,
    left_cols: tuple[str, ...],
    time_col: str = "event_s",
    key: str = "source",
) -> str:
    """DuckDB twin — a direct range join (DuckDB's IEJoin handles the
    non-equi predicate natively; the grid trick is Spark-side physics,
    not semantics)."""
    lcols = ", ".join(f"l.{c}" for c in left_cols)
    return f"""
SELECT {lcols},
       CAST(w.start_s AS BIGINT) AS start_s,
       CAST(w.end_s AS BIGINT)   AS end_s
FROM {left_cte} l
JOIN {windows_cte} w
  ON l.{key} = w.{key}
 AND l.{time_col} >= w.start_s
 AND l.{time_col} <  w.end_s
"""
