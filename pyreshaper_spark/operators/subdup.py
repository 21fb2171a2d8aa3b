"""Sequence-level duplication analysis — token k-gram overlap.

The dedup family so far works at DOCUMENT granularity (exact, MinHash,
SimHash, embeddings). Lee et al., *"Deduplicating Training Data Makes
Language Models Better"* (ACL 2022) showed the signal that matters for
LLM corpora is SUBSTRING-level: long token spans repeated across
documents (boilerplate, licenses, quotes) inflate memorization even
when no two documents are near-duplicates. The exact suffix-array
approach is a single-machine algorithm; the distributed approximation
everyone ships is k-gram granularity:

* :func:`crossdoc_dup_stats` — per document, how many of its token
  k-gram positions are covered by a k-gram that also occurs in ANOTHER
  document. High ratio → the doc is largely assembled from corpus-
  repeated spans.
* :func:`intradoc_repetition` — per document, total vs distinct
  k-grams (self-repetition — the "looping text" quality flag).

Scale shape: the k-gram stream is one row per token position (O(total
tokens) — the same cardinality the vocab operators already handle);
document frequency is a partial+final hash agg keyed by the 32-bit
k-gram hash; the per-position df lookup is a plain equi-join where the
BUILD side has one row per distinct k-gram (a hot k-gram is still one
row — no fan-out, no skew amplification). Nothing is quadratic.

Cross-engine exactness: k-gram identity is the md5-derived 32-bit hash
(functions.xhash) of the comma-joined token ids, so DuckDB reproduces
every number bit-for-bit (hash collisions merge the same k-grams in
both engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyreshaper_spark.functions.xhash import h32, h32_sql


def _kgram_hashes(tokens: Column, k: int) -> Column:
    """Array of 32-bit k-gram hashes over a token array (empty when the
    doc is shorter than k — sequence(1,0) would DESCEND, so guard)."""
    idx = F.when(
        F.size(tokens) >= k, F.sequence(F.lit(1), F.size(tokens) - (k - 1))
    ).otherwise(F.expr("array()").cast("array<int>"))
    return F.transform(
        idx,
        lambda i: h32(
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(tokens, i, k), lambda t: t.cast("string")
                ),
            )
        ),
    )


def token_kgrams(seq: DataFrame, k: int = 5) -> DataFrame:
    """(doc_id, kg) — one row per token k-gram POSITION (duplicates
    within a doc preserved; position identity itself is not needed by
    the consumers, only multiplicity)."""
    return seq.select(
        "doc_id", F.explode(_kgram_hashes(F.col("tokens"), k)).alias("kg")
    )


def crossdoc_dup_stats(
    seq: DataFrame, k: int = 5, num: int = 1, den: int = 2
) -> DataFrame:
    """Per-doc cross-document duplication: (doc_id, n_kg, n_dup,
    dup_heavy) where ``n_dup`` counts k-gram positions whose k-gram
    occurs in ≥2 distinct documents and ``dup_heavy`` is the exact
    integer threshold ``n_dup/n_kg >= num/den``."""
    kg = token_kgrams(seq, k)
    ddf = kg.groupBy("kg").agg(
        F.count_distinct("doc_id").alias("ddf")
    )
    return (
        kg.join(ddf, "kg")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_kg"),
            F.sum(F.when(F.col("ddf") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_dup"),
        )
        .withColumn(
            "dup_heavy",
            F.col("n_dup") * F.lit(den) >= F.col("n_kg") * F.lit(num),
        )
    )


def intradoc_repetition(seq: DataFrame, k: int = 5) -> DataFrame:
    """Per-doc self-repetition: (doc_id, n_kg, n_distinct, n_repeat)
    with ``n_repeat = n_kg − n_distinct`` (positions repeating a k-gram
    already present in the same doc — the looping-text flag). One hash
    aggregate over the k-gram stream."""
    kg = token_kgrams(seq, k)
    return (
        kg.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_kg"),
            F.count_distinct("kg").cast("long").alias("n_distinct"),
        )
        .withColumn("n_repeat", F.col("n_kg") - F.col("n_distinct"))
    )


# --------------------------------------------------------------------------
# oracles — over the md5-derived cross-engine token stream (vocab.py
# pattern: the operator is identical; only the fixture token derivation
# is swapped for one DuckDB can recompute)
# --------------------------------------------------------------------------

def _kgram_cte(k: int, vocab_size: int) -> str:
    kg_of_i = h32_sql(f"array_to_string(tokens[i:i+{k - 1}], ',')")
    return f"""toks AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         list_transform(regexp_split_to_array(lower(text), '\\s+'),
                        w -> {h32_sql('w')} % {vocab_size}) AS tokens
  FROM documents
),
kg AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(tokens) - {k - 1}, 0)),
           i -> {kg_of_i})) AS kg
  FROM toks
)"""


def crossdoc_dup_sql(
    k: int, vocab_size: int, num: int = 1, den: int = 2
) -> str:
    return f"""
WITH {_kgram_cte(k, vocab_size)},
ddf AS (SELECT kg, count(DISTINCT doc_id) AS ddf FROM kg GROUP BY 1)
SELECT kg.doc_id,
       count(*) AS n_kg,
       CAST(sum(CASE WHEN ddf >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       CAST(sum(CASE WHEN ddf >= 2 THEN 1 ELSE 0 END) AS BIGINT) * {den}
         >= count(*) * {num} AS dup_heavy
FROM kg JOIN ddf USING (kg)
GROUP BY 1
"""


def intradoc_repetition_sql(k: int, vocab_size: int) -> str:
    return f"""
WITH {_kgram_cte(k, vocab_size)}
SELECT doc_id,
       count(*)                               AS n_kg,
       count(DISTINCT kg)                     AS n_distinct,
       count(*) - count(DISTINCT kg)          AS n_repeat
FROM kg
GROUP BY 1
"""


def ngram_novelty(seq_days: DataFrame, k: int = 5) -> DataFrame:
    """Per-(source, intake day) k-gram NOVELTY trend: of the day's
    token k-gram occurrences, how many belong to a k-gram whose global
    corpus debut is that same day. A falling ``novel_ppm`` curve is
    the span-level memorization/repetition signal — the k-gram
    complement of the doc-level ``dup_rate_by_day`` (a crawl can have
    0 % duplicate DOCS while 90 % of its text spans are old news).

    Input: (doc_id, tokens, source, day_s). Occurrence-level by
    design: every occurrence on the debut day counts as novel
    (including same-day repeats) — deterministic with no within-day
    order assumption, unlike a position-level first-seen rule, which
    would depend on an arbitrary intra-day tie-break.

    Scale shape: the k-gram stream is one row per token position (the
    subdup/vocab cardinality); the debut day is a partial+final hash
    agg keyed on the 32-bit k-gram hash; the per-position debut lookup
    is a plain equi-join where the build side has ONE row per distinct
    k-gram (hot k-grams don't fan out); then one O(sources × days)
    agg. Nothing quadratic, no window.
    """
    kg = seq_days.select(
        "source",
        F.col("day_s").cast("long").alias("day_s"),
        F.explode(_kgram_hashes(F.col("tokens"), k)).alias("kg"),
    )
    debut = kg.groupBy("kg").agg(F.min("day_s").alias("d0"))
    return (
        kg.join(debut, "kg")
        .groupBy("source", "day_s")
        .agg(
            F.count("*").cast("long").alias("n_pos"),
            F.sum((F.col("day_s") == F.col("d0")).cast("long"))
            .cast("long")
            .alias("n_new"),
        )
        .withColumn(
            "novel_ppm",
            F.expr("n_new * 1000000 div n_pos").cast("long"),
        )
    )


def ngram_novelty_sql(k: int, vocab_size: int, day_expr: str) -> str:
    """DuckDB twin of :func:`ngram_novelty` over ``documents`` with the
    fixture's Lehmer intake day (``day_expr`` in terms of doc_id)."""
    kg_of_i = h32_sql(f"array_to_string(tokens[i:i+{k - 1}], ',')")
    return f"""
WITH toks AS (
  SELECT source, {day_expr} AS day_s,
         list_transform(regexp_split_to_array(lower(text), '\\s+'),
                        w -> {h32_sql('w')} % {vocab_size}) AS tokens
  FROM documents
),
kg AS (
  SELECT source, day_s,
         unnest(list_transform(
           generate_series(1, greatest(len(tokens) - {k - 1}, 0)),
           i -> {kg_of_i})) AS kg
  FROM toks
),
debut AS (SELECT kg, min(day_s) AS d0 FROM kg GROUP BY 1)
SELECT source, day_s,
       CAST(count(*) AS BIGINT) AS n_pos,
       CAST(sum(CASE WHEN day_s = d0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new,
       CAST(sum(CASE WHEN day_s = d0 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS novel_ppm
FROM kg JOIN debut USING (kg)
GROUP BY 1, 2
"""
