"""Fixture determinism + cross-engine agreement (FIXTURES.md F1-F3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyreshaper_spark.config import EPOCH0, HORIZON_S
from pyreshaper_spark.fixtures import seq_cte, sequences_df
from tests.conftest import SF_SMOKE, ddb_rows_set, rows_set


def test_schema_contract(seq):
    assert set(seq.columns) == {"doc_id", "tokens", "n_tok", "source", "event_s"}
    dt = dict(seq.dtypes)
    assert dt["tokens"] == "array<int>"
    assert dt["event_s"] == "bigint"


def test_deterministic_rebuild(spark, seq):
    again = sequences_df(spark, SF_SMOKE)
    assert rows_set(again, ["doc_id", "n_tok", "source", "event_s"]) == rows_set(
        seq, ["doc_id", "n_tok", "source", "event_s"]
    )
    # token arrays identical too (exact array equality, native comparison)
    joined = seq.alias("a").join(again.alias("b"), "doc_id")
    assert joined.filter(F.col("a.tokens") != F.col("b.tokens")).count() == 0


def test_matches_duckdb_derivation(seq, ddb):
    cols = ["doc_id", "n_tok", "event_s", "source"]
    spark_side = rows_set(
        seq.select("doc_id", F.col("n_tok").cast("long").alias("n_tok"), "event_s", "source"),
        cols,
    )
    duck_side = ddb_rows_set(
        ddb, f"WITH {seq_cte('base')} SELECT doc_id, n_tok, event_s, source FROM sequences", cols
    )
    assert spark_side == duck_side


def test_event_time_within_horizon(seq):
    bad = seq.filter(
        (F.col("event_s") < EPOCH0) | (F.col("event_s") >= EPOCH0 + HORIZON_S)
    )
    assert bad.count() == 0


def test_skew_variant_is_skewed(spark):
    sk = sequences_df(spark, SF_SMOKE, variant="skew")
    counts = {r["source"]: r["n"] for r in sk.groupBy("source").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert counts.get("srcHOT", 0) / total >= 0.85


def test_repeat_multiplies_rows_with_unique_ids(spark):
    r3 = sequences_df(spark, SF_SMOKE, repeat=3)
    n1 = sequences_df(spark, SF_SMOKE).count()
    assert r3.count() == 3 * n1
    assert r3.select("doc_id").distinct().count() == 3 * n1
