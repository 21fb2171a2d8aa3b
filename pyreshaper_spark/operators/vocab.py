"""Token-level vocabulary analytics over the tokens payload axis.

The corpus tables carry token streams two ways: the engine's
``sequences.tokens`` column (array<int>, Spark-side ``xxhash64``
values — fast, but not reproducible in DuckDB) and, for the oracle
gate, a cross-engine stream derived per word via
:func:`pyreshaper_spark.functions.xhash.h32` (md5-based — byte-identical
in both engines, see xhash.py). Every operator here takes a generic
``tok(source, event_s, token)`` relation, so the SAME aggregation code
runs on either derivation: production uses
``explode_tokens(sequences)``; the driver's correctness gate feeds
:func:`token_stream` / :func:`token_cte` instead.

Scale notes (100 TB design point): explode multiplies rows by n_tok —
that is the token axis's intrinsic volume, and it never survives an
exchange: the first aggregate keys on (…, token) and Spark's partial
(map-side) hash agg collapses each input partition to its OCCUPIED key
count before the shuffle, which the bounded vocabulary (V = 50,257)
caps at O(sources × buckets × V) regardless of corpus size. Everything
downstream of that first aggregate is tier-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyreshaper_spark.config import EPOCH0, HORIZON_S
from pyreshaper_spark.fixtures import VOCAB_SIZE
from pyreshaper_spark.functions.xhash import h32, h32_sql, perm, words_col

from .rollup import bucket_col


def explode_tokens(seq: DataFrame) -> DataFrame:
    """Production token stream: one row per token occurrence from the
    ``sequences`` table — (source, event_s, token)."""
    return seq.select(
        "source", "event_s", F.explode("tokens").alias("token")
    )


def token_stream(docs: DataFrame) -> DataFrame:
    """Oracle-comparable token stream built straight from ``documents``:
    token = h32(word) % V, event_s from the fixture's Lehmer spread —
    both derivations exactly expressible in DuckDB (:func:`token_cte`).
    """
    return docs.select(
        "source",
        (
            F.lit(EPOCH0)
            + F.pmod(
                F.col("doc_id").cast("long") * F.lit(48271) + F.lit(11),
                F.lit(HORIZON_S),
            )
        ).cast("long").alias("event_s"),
        F.explode(words_col()).alias("w"),
    ).select(
        "source",
        "event_s",
        F.pmod(h32(F.col("w")), F.lit(VOCAB_SIZE)).cast("long").alias("token"),
    )


def token_cte() -> str:
    """DuckDB CTE body defining the same `tok(source, event_s, token)`
    relation as :func:`token_stream`, from the `documents` view."""
    return f"""tok AS (
  SELECT source,
         {EPOCH0} + (doc_id * 48271 + 11) % {HORIZON_S} AS event_s,
         {h32_sql('w')} % {VOCAB_SIZE}                  AS token
  FROM (SELECT doc_id, source,
               unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
        FROM documents)
)"""


def token_topk(tok: DataFrame, width_s: int, k: int) -> DataFrame:
    """Top-k most frequent tokens per (source, time bucket) — the
    drifting-vocabulary monitor ("what dominated this source this
    hour?").

    Two exchanges: the occurrence count keyed (source, bucket, token)
    — map-side partial agg collapses the exploded stream first, output
    bounded by the vocabulary — then a per-(source, bucket) top-k
    window over those counts. Ties break deterministically by token id
    ascending, so results are engine-portable.
    """
    counts = (
        tok.select("source", bucket_col(width_s, "event_s"), "token")
        .groupBy("source", "bucket_s", "token")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("source", "bucket_s").orderBy(
        F.col("cnt").desc(), F.col("token").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "source",
            F.col("bucket_s").cast("long").alias("bucket_s"),
            F.col("token").cast("long").alias("token"),
            F.col("cnt").cast("long").alias("cnt"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def token_topk_sql(width_s: int, k: int) -> str:
    """DuckDB twin of :func:`token_topk` over the `tok` CTE."""
    return f"""
SELECT source, bucket_s, token, cnt, rank FROM (
  SELECT source, bucket_s, token, cnt,
         row_number() OVER (PARTITION BY source, bucket_s
                            ORDER BY cnt DESC, token ASC) AS rank
  FROM (
    SELECT source,
           (event_s // {width_s}) * {width_s} AS bucket_s,
           token,
           count(*) AS cnt
    FROM tok
    GROUP BY 1, 2, 3
  )
)
WHERE rank <= {k}
"""


def vocab_growth(tok: DataFrame, width_s: int) -> DataFrame:
    """Vocabulary-growth curve: per time bucket, how many tokens were
    seen for the FIRST time ever, plus the running distinct-vocabulary
    size — the heap's-law view of a training corpus.

    first-seen = min(bucket) per token (one aggregate, output ≤ V
    rows), then a V-row re-aggregate and one running-sum window over
    O(buckets) rows — nothing downstream of the first agg scales with
    the corpus.
    """
    first_seen = (
        tok.select(bucket_col(width_s, "event_s"), "token")
        .groupBy("token")
        .agg(F.min("bucket_s").alias("first_b"))
    )
    per_bucket = first_seen.groupBy(
        F.col("first_b").alias("bucket_s")
    ).agg(F.count("*").alias("new_tokens"))
    w = Window.orderBy("bucket_s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_bucket.select(
        F.col("bucket_s").cast("long").alias("bucket_s"),
        F.col("new_tokens").cast("long").alias("new_tokens"),
        F.sum("new_tokens").over(w).cast("long").alias("vocab_size"),
    )


def vocab_growth_sql(width_s: int) -> str:
    """DuckDB twin of :func:`vocab_growth` over the `tok` CTE."""
    return f"""
SELECT bucket_s,
       CAST(new_tokens AS BIGINT) AS new_tokens,
       CAST(sum(new_tokens) OVER (ORDER BY bucket_s
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS vocab_size
FROM (
  SELECT first_b AS bucket_s, count(*) AS new_tokens
  FROM (
    SELECT token, min((event_s // {width_s}) * {width_s}) AS first_b
    FROM tok GROUP BY 1
  )
  GROUP BY 1
)
"""


def token_ndv(tok: DataFrame, width_s: int) -> DataFrame:
    """Distinct-token count per (source, bucket) — vocabulary coverage
    over time (the tokens-axis sibling of ``rollup.bucket_ndv``). Exact
    distinct shuffles each distinct (group, token) once — bounded by
    the vocabulary; ``approx_count_distinct`` is the sketch path for
    unbounded id spaces."""
    return (
        tok.select("source", bucket_col(width_s, "event_s"), "token")
        .groupBy("source", "bucket_s")
        .agg(
            F.count("*").cast("long").alias("n_tok_occ"),
            F.countDistinct("token").cast("long").alias("ndv_token"),
        )
        .select(
            "source",
            F.col("bucket_s").cast("long").alias("bucket_s"),
            "n_tok_occ", "ndv_token",
        )
    )


def token_ndv_sql(width_s: int) -> str:
    """DuckDB twin of :func:`token_ndv` over the `tok` CTE."""
    return f"""
SELECT source,
       (event_s // {width_s}) * {width_s} AS bucket_s,
       count(*)                           AS n_tok_occ,
       count(DISTINCT token)              AS ndv_token
FROM tok
GROUP BY 1, 2
"""


def token_cms(
    tok: DataFrame, depth: int = 4, width: int = 64
) -> DataFrame:
    """Count-min sketch of per-source token frequencies: ``depth``
    independent hash rows × ``width`` counters — the mergeable
    heavy-hitter path for id spaces too large to aggregate exactly
    (:func:`token_topk` shuffles O(occupied vocabulary) keys; the
    sketch caps state at depth × width counters per source regardless
    of vocabulary size, and sketches merge by cell-wise addition, so
    tier cascades / append cycles union for free).

    Determinism across engines: row i's bucket is the xhash universal
    permutation (``(a_i·h + b_i) mod P31``, fixed constants) of the
    md5-derived 32-bit token hash, mod ``width`` — byte-identical in
    DuckDB (:func:`token_cms_sql`), so the full counter table is
    oracle-hashable, unlike engine-specific sketch blobs.

    Point estimates (min over rows of the probed cells) come from
    :func:`cms_estimate`; the classic bound err ≤ e/width · N holds per
    row with probability 1 − e^−depth.
    """
    hh = h32(F.col("token").cast("string"))
    rows = F.explode(
        F.array(*[
            F.struct(
                F.lit(i).alias("cms_row"),
                F.pmod(perm(i, hh), F.lit(width)).alias("cms_bucket"),
            )
            for i in range(depth)
        ])
    ).alias("cell")
    return (
        tok.select("source", rows)
        .groupBy(
            "source",
            F.col("cell.cms_row").alias("cms_row"),
            F.col("cell.cms_bucket").alias("cms_bucket"),
        )
        .agg(F.count("*").alias("cnt"))
        .select(
            "source",
            F.col("cms_row").cast("long").alias("cms_row"),
            F.col("cms_bucket").cast("long").alias("cms_bucket"),
            F.col("cnt").cast("long").alias("cnt"),
        )
    )


def cms_estimate(
    cms: DataFrame, tokens: DataFrame, depth: int = 4, width: int = 64
) -> DataFrame:
    """Point-query the sketch: estimated occurrence count per
    (source, token) = min over the depth rows of the probed cells.
    ``tokens`` carries (source, token) probe rows; the probe explodes
    into its depth cells and equi-joins the sketch — never a scan."""
    hh = h32(F.col("token").cast("string"))
    probes = tokens.select(
        "source",
        "token",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("cms_row"),
                    F.pmod(perm(i, hh), F.lit(width)).alias("cms_bucket"),
                )
                for i in range(depth)
            ])
        ).alias("cell"),
    ).select(
        "source", "token",
        F.col("cell.cms_row").cast("long").alias("cms_row"),
        F.col("cell.cms_bucket").cast("long").alias("cms_bucket"),
    )
    return (
        probes.join(cms, ["source", "cms_row", "cms_bucket"])
        .groupBy("source", "token")
        .agg(F.min("cnt").cast("long").alias("est_cnt"))
    )


def token_cms_sql(depth: int = 4, width: int = 64) -> str:
    """DuckDB twin of :func:`token_cms` over the `tok` CTE."""
    from pyreshaper_spark.functions.xhash import MINHASH_PERMS, P31

    h = h32_sql("CAST(token AS VARCHAR)")
    arms = []
    for i in range(depth):
        a, b = MINHASH_PERMS[i]
        arms.append(
            f"SELECT source, {i} AS cms_row, "
            f"((({h}) * {a} + {b}) % {P31}) % {width} AS cms_bucket "
            f"FROM tok"
        )
    cells = "\nUNION ALL\n".join(arms)
    return f"""
SELECT source, cms_row, cms_bucket, count(*) AS cnt
FROM ({cells})
GROUP BY 1, 2, 3
"""
