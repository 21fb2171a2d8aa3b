"""Deterministic ``sequences`` fixture builders (FIXTURES.md F1-F3).

The engine's input contract (BASELINE.json:15) is

    sequences(doc_id: string, tokens: array<int>, n_tok: int, source: string)

No such table ships in /root/testdata, so it is synthesized
deterministically from ``documents.parquet`` — with *identical*
derivations expressible in both Spark (DataFrame API, below) and DuckDB
(:data:`SEQ_CTE` — used by ``__spark_entry__.oracle_sql`` so the
driver's oracle compare sees the exact same logical input).

Cross-engine-deterministic choices (verified for parity):

* ``n_tok``   = regex-whitespace-split length of ``text``
  (Spark ``size(split(text, '\\s+'))`` ≡ DuckDB
  ``len(regexp_split_to_array(text, '\\s+'))``)
* ``event_s`` = ``EPOCH0 + (doc_num*48271 + 11) % HORIZON_S`` — pure
  int64 arithmetic, a Lehmer-style spread of docs over a 7-day horizon.
  No overflow (doc_num ≤ ~1e7 even row-multiplied).
* ``tokens``  = per-word ``pmod(xxhash64(word), 50257)`` — Spark-side
  only (token *values* never enter an oracle-compared result; only
  ``n_tok`` does, and ``n_tok == size(tokens)`` by construction).

Variants:

* ``base``  — F1, the primary input.
* ``gappy`` — F2: drop every minute-bucket ≡ 3 (mod 5) for source
  'src1' only; exercises gap-fill + LOCF.
* ``skew``  — F3: remap 90% of rows to a single hot source 'srcHOT';
  exercises salting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyreshaper_spark.config import EPOCH0, HORIZON_S

VOCAB_SIZE = 50257

#: DuckDB CTE body producing the same logical `sequences` relation from
#: the pre-registered `documents` view. Keyed by variant. Column set:
#: (doc_id:varchar, doc_num:bigint, source, n_tok:bigint, event_s:bigint).
_BASE_SELECT = f"""
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         doc_id                  AS doc_num,
         source,
         len(regexp_split_to_array(text, '\\s+')) AS n_tok,
         {EPOCH0} + (doc_id * 48271 + 11) % {HORIZON_S} AS event_s
  FROM documents
"""


def seq_cte(variant: str = "base") -> str:
    """DuckDB CTE text defining `sequences` for the oracle SQL."""
    if variant == "base":
        return f"sequences AS ({_BASE_SELECT})"
    if variant == "gappy":
        return (
            f"seq0 AS ({_BASE_SELECT}),\n"
            "sequences AS (SELECT * FROM seq0 WHERE NOT "
            "(source = 'src1' AND ((event_s // 60) % 5) = 3))"
        )
    if variant == "skew":
        return (
            f"seq0 AS ({_BASE_SELECT}),\n"
            "sequences AS (SELECT doc_id, doc_num, "
            "CASE WHEN doc_num % 10 < 9 THEN 'srcHOT' ELSE source END AS source, "
            "n_tok, event_s FROM seq0)"
        )
    raise ValueError(f"unknown variant {variant!r}")


def sequences_df(
    spark: SparkSession,
    sf_dir: str,
    variant: str = "base",
    repeat: int = 1,
) -> DataFrame:
    """Build the `sequences` DataFrame from ``{sf_dir}/documents.parquet``.

    ``repeat > 1`` deterministically row-multiplies for bench scale-up
    (each replica gets a distinct doc_id and a shifted doc_num, hence a
    distinct event time). Oracle-compared runs always use ``repeat=1``.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    if repeat > 1:
        reps = spark.range(repeat).select(F.col("id").alias("rep"))
        # pre-spread the TINY docs table first (a |docs|-row shuffle),
        # then cross-join the broadcast rep range: the ×repeat expansion
        # and the tokenizer run on all partitions. (Expanding before
        # repartitioning made the single-file scan task stream every
        # multiplied wide row into the shuffle alone — observed as a
        # multi-minute single-task stage at repeat=8000.)
        docs = docs.repartition(64).crossJoin(F.broadcast(reps)).select(
            F.concat_ws("#", F.col("doc_id").cast("string"), "rep").alias("doc_key"),
            (F.col("doc_id") + F.col("rep") * F.lit(1_000_003)).alias("doc_num"),
            "text",
            "source",
        )
    else:
        docs = docs.select(
            F.col("doc_id").cast("string").alias("doc_key"),
            F.col("doc_id").cast("long").alias("doc_num"),
            "text",
            "source",
        )

    seq = docs.select(
        F.col("doc_key").alias("doc_id"),
        "doc_num",
        "source",
        F.transform(
            F.split("text", r"\s+"),
            lambda w: F.pmod(F.xxhash64(w), F.lit(VOCAB_SIZE)).cast("int"),
        ).alias("tokens"),
    ).withColumn("n_tok", F.size("tokens"))

    seq = seq.withColumn(
        "event_s",
        (
            F.lit(EPOCH0)
            + F.pmod(F.col("doc_num") * F.lit(48271) + F.lit(11), F.lit(HORIZON_S))
        ).cast("long"),
    )

    if variant == "gappy":
        seq = seq.filter(
            ~(
                (F.col("source") == "src1")
                & (F.pmod(F.expr("event_s DIV 60"), F.lit(5)) == 3)
            )
        )
    elif variant == "skew":
        seq = seq.withColumn(
            "source",
            F.when(F.pmod("doc_num", F.lit(10)) < 9, F.lit("srcHOT")).otherwise(
                F.col("source")
            ),
        )
    elif variant != "base":
        raise ValueError(f"unknown variant {variant!r}")

    return seq.select("doc_id", "tokens", "n_tok", "source", "event_s")
