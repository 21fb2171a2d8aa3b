"""Input-validation gate — the reference's hard-fail inspection phase
recast (FIXTURES.md F4 assertions 1-2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyreshaper_spark.operators import validate as V
from pyreshaper_spark.operators.rollup import rollup_tier0


def test_valid_input_passes(seq):
    V.validate_input(seq)


def test_missing_column_fails(seq):
    with pytest.raises(V.ValidationError, match="missing columns"):
        V.check_schema(seq.drop("n_tok"))


def test_duplicate_doc_ids_fail(seq):
    dup = seq.union(seq.limit(1))
    with pytest.raises(V.ValidationError, match="duplicated doc_ids"):
        V.validate_input(dup)


def test_n_tok_contract_violation_fails(seq):
    broken = seq.withColumn(
        "n_tok", F.when(F.col("source") == "src1", F.col("n_tok") + 1).otherwise(F.col("n_tok"))
    )
    with pytest.raises(V.ValidationError, match="null/n_tok"):
        V.validate_input(broken)


def test_tier_monotonicity_holds(seq):
    tier = rollup_tier0(seq, 60)
    assert V.count_monotonicity_violations(tier) == 0


def test_source_completeness(seq):
    tier = rollup_tier0(seq, 60)
    V.check_source_completeness(seq, tier)
    with pytest.raises(V.ValidationError):
        V.check_source_completeness(seq, tier.filter(F.col("source") != "src1"))


def test_defer_mode_prunes_tokens_and_encoder_enforces(seq):
    from pyreshaper_spark.operators.encode import encode_series_table
    from pyreshaper_spark.operators.transpose import transpose_to_series

    broken = seq.withColumn(
        "n_tok",
        F.when(F.col("source") == "src1", F.col("n_tok") + 1).otherwise(
            F.col("n_tok")
        ),
    )
    # defer: the narrow gate passes (nulls/uniqueness fine) …
    V.validate_input(broken, token_sizes="defer")
    # … and the encode pass raises on the deferred size contract,
    # on both the packed and the unpacked path
    for pack in (True, False):
        enc = encode_series_table(
            transpose_to_series(broken, nsalt=2, num_partitions=4, pack=pack)
        )
        with pytest.raises(Exception, match="n_tok == size"):
            enc.count()
    # clean input encodes fine under the same paths
    assert (
        encode_series_table(
            transpose_to_series(seq, nsalt=2, num_partitions=4, pack=True)
        ).count()
        > 0
    )
