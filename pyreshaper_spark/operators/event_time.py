"""Event-time derivation (SURVEY.md §2.3).

The input contract ``sequences(doc_id, tokens, n_tok, source)`` carries
no timestamp; the engine derives a deterministic event time — the
analog of the reference reading each slice file's ``time`` coordinate
[U: reshaper.py :: input-inspection phase].

Two derivations:

* :func:`derive_event_time` — production path for an arbitrary
  4-column input: ``EPOCH0 + pmod(xxhash64(doc_id), HORIZON_S)``.
  Pure built-in, JVM-side, reproducible.
* Fixture inputs (``fixtures.sequences_df``) arrive with ``event_s``
  precomputed via a cross-engine (Spark ≡ DuckDB) arithmetic so the
  driver's oracle sees the identical timeline; :func:`ensure_event_time`
  uses it when present and derives otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyreshaper_spark.config import EPOCH0, HORIZON_S


def derive_event_time(
    df: DataFrame, epoch0: int = EPOCH0, horizon_s: int = HORIZON_S
) -> DataFrame:
    """Add ``event_s`` (epoch seconds, long) and ``event_ts`` (timestamp)."""
    return df.withColumn(
        "event_s",
        (F.lit(epoch0) + F.pmod(F.xxhash64("doc_id"), F.lit(horizon_s))).cast("long"),
    ).withColumn("event_ts", F.timestamp_seconds("event_s"))


def ensure_event_time(df: DataFrame) -> DataFrame:
    """Use a precomputed ``event_s`` column if present, else derive one."""
    if "event_s" not in df.columns:
        df = derive_event_time(df)
    if "event_ts" not in df.columns:
        df = df.withColumn("event_ts", F.timestamp_seconds("event_s"))
    return df
