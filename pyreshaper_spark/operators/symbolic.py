"""SAX symbolization of tier series (Lin/Keogh Symbolic Aggregate
approXimation, recast for the tiered rollup engine).

Classic SAX z-normalizes each series and cuts it at Gaussian
breakpoints — float arithmetic that can't be hash-compared across
engines. This implementation keeps the engine's exact-integer
discipline by replacing the Gaussian cuts with EMPIRICAL per-source
quartile breakpoints computed as order statistics:

* breakpoint ``b_k`` (k = 1 .. alphabet-1) is the tier value at
  ascending rank ``ceil(k·n / alphabet)`` within the source's series
  (``row_number`` ordered by ``(value, bucket_s)`` — the tiebreak only
  disambiguates WHICH row holds the rank; the value at a rank is
  unique regardless), computed identically in Spark and DuckDB;
* a frame's symbol is ``1 + #{k : value > b_k}`` → letters a..d for
  the default alphabet of 4 (value == b_k stays in the lower band,
  so both engines agree on ties);
* symbols concatenate into one word per (source, word bucket) in
  bucket-time order.

Scale shape: the input is an already-aggregated tier (O(buckets)
rows, never raw data). One source-keyed rank window, one broadcast
join of the (alphabet-1)-row-per-source breakpoint table, two hash
aggregations. The rank window is the same per-source sort every tier
analytic pays; everything else is map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyreshaper_spark.operators.rollup import floor_to, floor_sql

#: Symbol alphabet (index 1-based via substring); 26 symbols max.
_LETTERS = "abcdefghijklmnopqrstuvwxyz"


def sax_breakpoints(
    tier: DataFrame, value_col: str = "sum_n_tok", alphabet: int = 4
) -> DataFrame:
    """(source, k, b): the ``alphabet - 1`` empirical breakpoints per
    source — exact order statistics at ranks ``ceil(k·n/alphabet)``."""
    if not 2 <= alphabet <= len(_LETTERS):
        raise ValueError(f"alphabet must be in [2, 26]: {alphabet}")
    wr = Window.partitionBy("source").orderBy(value_col, "bucket_s")
    ranked = tier.select(
        "source",
        F.col(value_col).cast("long").alias("v"),
        F.row_number().over(wr).alias("rn"),
    )
    # cut ranks per source (alphabet-1 tiny rows), equi-joined back on
    # (source, rank) — a broadcast HASH join, no nested-loop anywhere
    rks = (
        tier.groupBy("source")
        .agg(F.count("*").alias("n"))
        .select(
            "source",
            F.posexplode(
                F.array(
                    *[
                        F.expr(f"(({k} * n + {alphabet - 1})"
                               f" div {alphabet})")
                        for k in range(1, alphabet)
                    ]
                )
            ).alias("k0", "rk"),
        )
        .select("source", (F.col("k0") + 1).alias("k"), "rk")
    )
    # both sides descend from `tier` — rename the small side's join
    # keys so the self-join lineage cannot alias them together
    rks = rks.withColumnRenamed("source", "bp_source")
    return (
        ranked.join(
            F.broadcast(rks),
            (F.col("source") == F.col("bp_source"))
            & (F.col("rn") == F.col("rk")),
        )
        .select("source", "k", F.col("v").alias("b"))
    )


def sax_symbols(
    tier: DataFrame, value_col: str = "sum_n_tok", alphabet: int = 4
) -> DataFrame:
    """(source, frame_s, letter): one symbol per tier point — the
    shared front half of :func:`sax_words` and :func:`sax_motifs`."""
    bps = sax_breakpoints(tier, value_col, alphabet)
    pts = tier.select(
        "source",
        F.col("bucket_s").cast("long").alias("frame_s"),
        F.col(value_col).cast("long").alias("v"),
    )
    # symbol = 1 + count of breakpoints strictly below v (join fans
    # each frame out to alphabet-1 broadcast rows, collapsed right
    # back map-side by the partial agg)
    return (
        pts.join(F.broadcast(bps), "source")
        .groupBy("source", "frame_s")
        .agg(
            (
                F.lit(1)
                + F.sum(F.when(F.col("v") > F.col("b"), 1).otherwise(0))
            ).alias("s")
        )
        .withColumn(
            "letter", F.expr(f"substring('{_LETTERS[:alphabet]}', s, 1)")
        )
    )


def sax_words(
    tier: DataFrame,
    word_w: int,
    value_col: str = "sum_n_tok",
    alphabet: int = 4,
) -> DataFrame:
    """One SAX word per (source, ``word_w``-wide bucket): the tier's
    ``value_col`` series symbolized at the source's empirical
    breakpoints, letters concatenated in bucket-time order.

    Output: ``(source, bucket_s, sax_word, n_frames)``.
    """
    sym = sax_symbols(tier, value_col, alphabet)
    return (
        sym.groupBy(
            "source", floor_to(F.col("frame_s"), word_w).alias("bucket_s")
        )
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("frame_s", "letter"))
                    ),
                    lambda x: x["letter"],
                ),
            ).alias("sax_word"),
            F.count("*").cast("long").alias("n_frames"),
        )
    )


def sax_symbols_sql(
    relation: str, value_col: str = "sum_n_tok", alphabet: int = 4
) -> str:
    """DuckDB subquery producing (source, frame_s, letter) — twin of
    :func:`sax_symbols`; shared by the word and motif SQL twins."""
    if not 2 <= alphabet <= len(_LETTERS):
        raise ValueError(f"alphabet must be in [2, 26]: {alphabet}")
    letters = _LETTERS[:alphabet]
    ks = ", ".join(f"({k})" for k in range(1, alphabet))
    return f"""
  SELECT source, frame_s,
         substring('{letters}', CAST(s AS INTEGER), 1) AS letter
  FROM (
    SELECT p.source, p.frame_s,
           1 + sum(CASE WHEN p.v > bp.b THEN 1 ELSE 0 END) AS s
    FROM (
      SELECT source,
             CAST(bucket_s AS BIGINT)    AS frame_s,
             CAST({value_col} AS BIGINT) AS v
      FROM {relation}
    ) p
    JOIN (
      SELECT source, k, v AS b
      FROM (
        SELECT source, CAST({value_col} AS BIGINT) AS v,
               row_number() OVER (
                 PARTITION BY source
                 ORDER BY CAST({value_col} AS BIGINT), bucket_s) AS rn,
               count(*) OVER (PARTITION BY source) AS n
        FROM {relation}
      )
      JOIN (VALUES {ks}) ks(k)
        ON rn = (k * n + {alphabet - 1}) // {alphabet}
    ) bp ON p.source = bp.source
    GROUP BY p.source, p.frame_s
  )
"""


def sax_words_sql(
    relation: str,
    word_w: int,
    value_col: str = "sum_n_tok",
    alphabet: int = 4,
) -> str:
    """DuckDB twin of :func:`sax_words` over a named tier relation
    with columns ``(source, bucket_s, {value_col})``."""
    return f"""
SELECT source, bucket_s,
       string_agg(letter, '' ORDER BY frame_s) AS sax_word,
       CAST(count(*) AS BIGINT)                AS n_frames
FROM (
  SELECT source, frame_s,
         {floor_sql('frame_s', word_w)} AS bucket_s,
         letter
  FROM ({sax_symbols_sql(relation, value_col, alphabet)})
)
GROUP BY source, bucket_s
"""


def sax_motifs(
    tier: DataFrame,
    m: int,
    value_col: str = "sum_n_tok",
    alphabet: int = 4,
    min_count: int = 2,
) -> DataFrame:
    """Motif discovery over the symbolized series: every OVERLAPPING
    ``m``-symbol subword per source (the sliding-window complement of
    :func:`sax_words`' non-overlapping tiling), counted; subwords
    occurring ≥ ``min_count`` times are the series' recurring shapes —
    the SAX-word motif index of Lin/Keogh/Patel, the symbolic stand-in
    for a matrix-profile scan.

    Subwords are assembled with ``m−1`` LEAD() calls concatenated in
    frame order (NULL past the series end propagates through concat and
    the partial window is dropped) — no reliance on either engine's
    list-aggregation frame order. Output ``(source, motif, cnt)``.

    Scale shape: symbols are tier-bounded (O(sources × buckets)); one
    source-keyed sort window supplies all m−1 leads at once; the motif
    count is a partial+final hash agg. No self-join, no cartesian.
    """
    assert m >= 2
    sym = sax_symbols(tier, value_col, alphabet)
    w = Window.partitionBy("source").orderBy("frame_s")
    word = F.concat(
        F.col("letter"),
        *[F.lead("letter", i).over(w) for i in range(1, m)],
    )
    return (
        sym.select("source", word.alias("motif"))
        .filter(F.col("motif").isNotNull())
        .groupBy("source", "motif")
        .agg(F.count("*").cast("long").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )


def sax_motifs_sql(
    relation: str,
    m: int,
    value_col: str = "sum_n_tok",
    alphabet: int = 4,
    min_count: int = 2,
) -> str:
    """DuckDB twin of :func:`sax_motifs` over a named tier relation."""
    assert m >= 2
    leads = " || ".join(
        ["letter"]
        + [
            f"lead(letter, {i}) OVER "
            "(PARTITION BY source ORDER BY frame_s)"
            for i in range(1, m)
        ]
    )
    return f"""
SELECT source, motif, CAST(count(*) AS BIGINT) AS cnt
FROM (
  SELECT source, {leads} AS motif
  FROM ({sax_symbols_sql(relation, value_col, alphabet)})
)
WHERE motif IS NOT NULL
GROUP BY 1, 2
HAVING count(*) >= {min_count}
"""
