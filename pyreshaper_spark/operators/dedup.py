"""Deduplication operators over the ``documents`` table.

Training-data pipeline surface: exact dup groups, MinHash+LSH
candidates with exact-Jaccard verification, SimHash near-dup pairs,
word-n-gram Jaccard, and embedding-cosine near-dup (in similarity.py).

Engineering rules shared by every operator here:

* **Built-ins only** — word splitting, hashing, signatures, banding and
  pair generation are all JVM-side column expressions + joins; no
  Python in the flow.
* **Exact cross-engine parity** — all randomness comes from md5-derived
  32-bit word hashes (functions.xhash) and all emitted values are
  integers, so the DuckDB oracle matches bit-for-bit.
* **Scale shape** — signatures are one hash-aggregate per doc
  (shuffle keyed by doc, O(docs) rows); candidate generation is an
  equi-join on (band, band-signature) buckets, never an O(n²) cross
  join; only verified candidate pairs reach the exact-Jaccard join.
  Hot buckets (boilerplate) are the skew risk at 100 TB — cap bucket
  width upstream or salt the band key; see pair-cap note below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyreshaper_spark.functions.xhash import (
    MINHASH_PERMS,
    P31,
    WORDS_SQL,
    h32,
    h32_sql,
    perm,
    perm_sql,
    words_col,
)

N_PERM = len(MINHASH_PERMS)  # 16
N_BANDS = 4                  # 4 bands × 4 rows
ROWS_PER_BAND = N_PERM // N_BANDS

SIMHASH_BITS = 32


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """Hash-groupBy exact dedup: one row per duplicated text, with the
    canonical keeper (min doc_id) — the classic first-pass filter."""
    return (
        docs.groupBy(F.md5(F.col("text").cast("binary")).alias("text_md5"))
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_copies") > 1)
    )


EXACT_DUP_SQL = """
SELECT md5(text)    AS text_md5,
       count(*)     AS n_copies,
       min(doc_id)  AS keep_doc_id
FROM documents
GROUP BY 1
HAVING count(*) > 1
"""


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

def _doc_words(docs: DataFrame, max_df: int | None = None) -> DataFrame:
    """(doc_id, word) distinct pairs — the shingle set (word unigrams;
    the shingle width is a config knob, unigrams keep the oracle SQL
    readable).

    ``max_df`` drops words occurring in more than that many documents —
    the hot-boilerplate guard that keeps candidate joins bounded at web
    scale (a stopword shared by every page otherwise makes the
    shared-shingle join quadratic). Changes near-dup semantics, so it
    is an explicit opt-in with its own oracle query."""
    dw = docs.select(
        "doc_id", F.explode(F.array_distinct(words_col())).alias("word")
    )
    if max_df is None:
        return dw
    # broadcast the HOT list (df > cap), not the keep list: at web scale
    # the keep side is ~the whole vocabulary (unbroadcastable) while the
    # hot side is by construction tiny — anti-join drops it map-side
    hot = (
        dw.groupBy("word")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_df)
        .select("word")
    )
    return dw.join(F.broadcast(hot), "word", "left_anti")


def minhash_signatures(docs: DataFrame, max_df: int | None = None) -> DataFrame:
    """One row per doc: sig_0..sig_{k-1} MinHash signature columns.

    Single hash-aggregate: explode distinct words, k min-aggregations
    over universal-hash permutations of the word hash. Shuffle volume
    is O(doc × distinct-word), the aggregate is partial+final."""
    dw = _doc_words(docs, max_df).withColumn("h", h32(F.col("word")))
    aggs = [
        F.min(perm(i, F.col("h"))).alias(f"sig_{i}") for i in range(N_PERM)
    ]
    return dw.groupBy("doc_id").agg(*aggs)


def _banded(sigs: DataFrame) -> DataFrame:
    """(doc_id, band, band_key) rows — each doc appears N_BANDS times."""
    bands = []
    for b in range(N_BANDS):
        cols = [f"sig_{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)]
        bands.append(
            sigs.select(
                "doc_id",
                F.lit(b).alias("band"),
                F.concat_ws("_", *cols).alias("band_key"),
            )
        )
    banded = bands[0]
    for x in bands[1:]:
        banded = banded.unionByName(x)
    return banded


def signature_index(docs: DataFrame, max_df: int | None = None) -> DataFrame:
    """The committed dedup index for incremental ingestion: banded
    MinHash rows (doc_id, band, band_key), 4 small rows per doc.

    Persist this table alongside the corpus; each ingest batch then
    dedups against the whole history at O(new batch) cost — see
    :func:`incremental_candidates`."""
    return _banded(minhash_signatures(docs, max_df))


def incremental_candidates(
    new_docs: DataFrame, index: DataFrame, max_df: int | None = None
) -> DataFrame:
    """Near-dup candidates for an ingest batch against a committed
    signature index — the 100 TB ingestion flow: signatures are
    computed ONLY for the new batch, the join probes new-batch band
    rows against (index ∪ new), and old×old pairs are never revisited.
    Work per batch is O(new docs) + the equi-join probe; the historical
    corpus is touched only through its 4-rows-per-doc index.

    Output ≡ ``lsh_candidate_pairs`` over (old ∪ new) restricted to
    pairs involving ≥1 new doc — the incremental-equals-from-scratch
    property, asserted in tests and by the driver oracle. Pairs are
    (doc_a < doc_b) canonical; ``n_bands`` counts distinct agreeing
    bands (a new×new pair is seen from both orientations, so a plain
    count would double it).

    ``max_df`` caps are batch-local by design (hot-shingle frequency is
    computed within the batch, matching what an online ingester can
    know); leave it None for exact from-scratch parity.
    """
    nb = signature_index(new_docs, max_df)
    allb = index.unionByName(nb)
    a, b = nb.alias("a"), allb.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least("a.doc_id", "b.doc_id").alias("doc_a"),
            F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
            F.col("a.band").alias("band"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count_distinct("band").alias("n_bands"))
    )


def _sig_cols_sql() -> str:
    """Shared signature-column SQL (single source of truth for the
    permutation list — the Spark-side analog is minhash_signatures)."""
    return ",\n         ".join(
        f"min({perm_sql(i, 'h')}) AS sig_{i}" for i in range(N_PERM)
    )


def _band_rows_sql() -> str:
    """Shared banding SQL over a ``sigs`` CTE (analog of _banded)."""
    band_rows = []
    for b in range(N_BANDS):
        cols = [f"sig_{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)]
        key = " || '_' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
        band_rows.append(f"SELECT doc_id, {b} AS band, {key} AS band_key FROM sigs")
    return "\nUNION ALL\n".join(band_rows)


def incremental_minhash_sql(new_pred: str) -> str:
    """DuckDB twin of index-build + :func:`incremental_candidates` over
    the ``documents`` view, with ``new_pred`` (SQL over ``doc_id``)
    selecting the new batch. Mirrors the Spark shape exactly: probe
    side restricted to new docs, distinct-band count per canonical
    pair."""
    return f"""
WITH dw AS (
  SELECT DISTINCT doc_id, word
  FROM (SELECT doc_id, unnest({WORDS_SQL}) AS word FROM documents)
),
dh AS (SELECT doc_id, {h32_sql("word")} AS h FROM dw),
sigs AS (
  SELECT doc_id,
         {_sig_cols_sql()}
  FROM dh GROUP BY doc_id
),
banded AS (
{_band_rows_sql()}
),
newb AS (SELECT * FROM banded WHERE {new_pred})
SELECT least(a.doc_id, b.doc_id) AS doc_a,
       greatest(a.doc_id, b.doc_id) AS doc_b,
       count(DISTINCT a.band) AS n_bands
FROM newb a
JOIN banded b
  ON a.band = b.band AND a.band_key = b.band_key
 AND a.doc_id <> b.doc_id
GROUP BY 1, 2
"""


def lsh_candidate_pairs(
    sigs: DataFrame, max_bucket: int | None = None
) -> DataFrame:
    """Band the signatures and self-join buckets → candidate pairs with
    the number of agreeing bands. Pairs are (a < b) canonical.

    ``max_bucket`` drops (band, band_key) buckets wider than that many
    docs BEFORE the self-join — the second web-scale boundedness knob
    (complementing ``max_df``): a boilerplate cluster of B identical-ish
    docs otherwise lands in one bucket and emits B² pairs. With the cap,
    per-bucket fan-out is ≤ max_bucket² no matter how pathological the
    corpus; giant buckets are exact-dup work, which ``exact_dup_groups``
    handles at O(B). Opt-in (changes recall semantics) with its own
    oracle query."""
    banded = _banded(sigs)
    if max_bucket is not None:
        # shared pre-join bucket cap (one window count on the same
        # (band, band_key) the join shuffles on — AQE coalesces the
        # exchanges); one implementation for the MinHash and
        # hyperplane-LSH families so cap semantics cannot drift
        from pyreshaper_spark.operators.similarity import _cap_buckets

        banded = _cap_buckets(banded, ["band", "band_key"], max_bucket)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_bands"))
    )


def verified_near_dups(
    docs: DataFrame,
    jaccard_num: int = 1,
    jaccard_den: int = 2,
    max_df: int | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """MinHash→LSH→exact-verify near-dup pipeline.

    Candidates from band buckets, then EXACT Jaccard via a distinct-word
    join, kept when ``inter * den >= union * num`` (integer threshold
    num/den, default 1/2). Output: (doc_a, doc_b, n_bands, inter,
    union_sz) — all integers."""
    sigs = minhash_signatures(docs, max_df)
    cand = lsh_candidate_pairs(sigs, max_bucket)
    dw = _doc_words(docs, max_df)
    sizes = dw.groupBy("doc_id").agg(F.count("*").alias("n_words"))
    # exact intersections keyed ON THE CANDIDATE PAIR LIST: join the
    # pair list to doc_a's words, then equi-join (doc_b, word).  Work is
    # O(sum over candidate pairs of |words(doc_a)|) — bounded by the LSH
    # stage's output, never by hot-word df.  (The earlier all-pairs word
    # self-join re-did the quadratic work LSH exists to avoid.)
    pair_words = (
        cand.select("doc_a", "doc_b")
        .join(dw.select(F.col("doc_id").alias("doc_a"), "word"), "doc_a")
        .join(
            dw.select(F.col("doc_id").alias("doc_b"), "word"),
            ["doc_b", "word"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        cand.join(pair_words, ["doc_a", "doc_b"], "left")
        .na.fill({"inter": 0})
        .join(
            sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
                "n_words", "na"
            ),
            "doc_a",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "n_words", "nb"
            ),
            "doc_b",
        )
        .withColumn("union_sz", F.col("na") + F.col("nb") - F.col("inter"))
        .filter(
            F.col("inter") * F.lit(jaccard_den)
            >= F.col("union_sz") * F.lit(jaccard_num)
        )
        .select("doc_a", "doc_b", "n_bands", "inter", "union_sz")
    )
    return out


def minhash_lsh_sql(
    jaccard_num: int = 1,
    jaccard_den: int = 2,
    max_df: int | None = None,
    max_bucket: int | None = None,
) -> str:
    h = h32_sql("word")
    df_guard = (
        f""",
kept AS (SELECT word FROM dw GROUP BY word HAVING count(*) <= {max_df}),
dwf AS (SELECT dw.doc_id, dw.word FROM dw JOIN kept USING (word))"""
        if max_df is not None
        else ",\ndwf AS (SELECT * FROM dw)"
    )
    sig_cols = _sig_cols_sql()
    banded = _band_rows_sql()
    bucket_guard = (
        f""",
banded AS (
  SELECT doc_id, band, band_key FROM (
    SELECT *, count(*) OVER (PARTITION BY band, band_key) AS bucket_n
    FROM banded0
  ) WHERE bucket_n <= {max_bucket}
)"""
        if max_bucket is not None
        else ",\nbanded AS (SELECT * FROM banded0)"
    )
    return f"""
WITH dw AS (
  SELECT DISTINCT doc_id, word
  FROM (SELECT doc_id, unnest({WORDS_SQL}) AS word FROM documents)
){df_guard},
dh AS (SELECT doc_id, {h} AS h FROM dwf),
sigs AS (
  SELECT doc_id,
         {sig_cols}
  FROM dh GROUP BY doc_id
),
banded0 AS (
{banded}
){bucket_guard},
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_bands
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, count(*) AS n_words FROM dwf GROUP BY 1),
pair_words AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cand c
  JOIN dwf x ON x.doc_id = c.doc_a
  JOIN dwf y ON y.doc_id = c.doc_b AND y.word = x.word
  GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b, c.n_bands,
       coalesce(p.inter, 0) AS inter,
       sa.n_words + sb.n_words - coalesce(p.inter, 0) AS union_sz
FROM cand c
LEFT JOIN pair_words p ON c.doc_a = p.doc_a AND c.doc_b = p.doc_b
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
WHERE coalesce(p.inter, 0) * {jaccard_den}
      >= (sa.n_words + sb.n_words - coalesce(p.inter, 0)) * {jaccard_num}
"""


# --------------------------------------------------------------------------
# MinHash top-k similar-document search
# --------------------------------------------------------------------------

#: Fraction-ranking scale: rank key = floor(inter * SCALE / union) — an
#: exact integer computed identically in both engines. Collisions only
#: merge Jaccards closer than 1e-9; the (key desc, neighbor asc) total
#: order stays deterministic either way.
_JACCARD_SCALE = 1_000_000_000


def minhash_topk(
    docs: DataFrame,
    k: int = 5,
    max_df: int | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Top-``k`` most-similar documents per document, by EXACT Jaccard
    over the MinHash-LSH candidate set — the document-level similarity
    search face of the dedup stack (the ANN family in ``similarity.py``
    covers the embedding side; this covers the lexical side).

    Candidates come from :func:`verified_near_dups` with a 0/1
    threshold (every LSH candidate survives, each carrying its exact
    ``inter``/``union_sz``); pairs are then symmetrized (each member
    sees the other as a neighbor) and ranked per document by the scaled
    integer Jaccard key ``inter·10^9 div union_sz`` (descending,
    neighbor id ascending tie-break).

    Output ``(doc_id, neighbor, inter, union_sz, rank)``, rank ≤ k.

    Scale shape: everything up to ranking is the (bounded, capped) LSH
    pipeline; the ranking window is keyed per doc_id over that doc's
    candidate list only — Spark plans the rank≤k filter as a
    WindowGroupLimit pushdown, so each map task forwards at most k
    rows per doc into the sort.
    """
    pairs = verified_near_dups(
        docs, jaccard_num=0, jaccard_den=1,
        max_df=max_df, max_bucket=max_bucket,
    ).filter(F.col("union_sz") > 0)
    fwd = pairs.select(
        F.col("doc_a").alias("doc_id"),
        F.col("doc_b").alias("neighbor"),
        "inter", "union_sz",
    )
    rev = pairs.select(
        F.col("doc_b").alias("doc_id"),
        F.col("doc_a").alias("neighbor"),
        "inter", "union_sz",
    )
    sym = fwd.unionByName(rev)
    jkey = F.expr(f"(inter * {_JACCARD_SCALE}) div union_sz")
    w = Window.partitionBy("doc_id").orderBy(
        jkey.desc(), F.col("neighbor").asc()
    )
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id", "neighbor",
            F.col("inter").cast("long").alias("inter"),
            F.col("union_sz").cast("long").alias("union_sz"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def minhash_topk_sql(
    k: int = 5,
    max_df: int | None = None,
    max_bucket: int | None = None,
) -> str:
    """DuckDB twin of :func:`minhash_topk`."""
    return f"""
SELECT doc_id, neighbor,
       CAST(inter AS BIGINT)    AS inter,
       CAST(union_sz AS BIGINT) AS union_sz,
       CAST(rank AS BIGINT)     AS rank
FROM (
  SELECT doc_id, neighbor, inter, union_sz,
         row_number() OVER (
           PARTITION BY doc_id
           ORDER BY (inter * {_JACCARD_SCALE}) // union_sz DESC,
                    neighbor ASC) AS rank
  FROM (
    SELECT doc_a AS doc_id, doc_b AS neighbor, inter, union_sz
    FROM pairs WHERE union_sz > 0
    UNION ALL
    SELECT doc_b AS doc_id, doc_a AS neighbor, inter, union_sz
    FROM pairs WHERE union_sz > 0
  )
)
WHERE rank <= {k}
"""




# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash(docs: DataFrame) -> DataFrame:
    """32-bit SimHash per doc: bit j set iff the sum over distinct words
    of ±1 (word-hash bit j) is positive. One explode + one aggregate."""
    dw = _doc_words(docs).withColumn("h", h32(F.col("word")))
    bit_sums = [
        F.sum(
            F.when(
                F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"s_{j}")
        for j in range(SIMHASH_BITS)
    ]
    agg = dw.groupBy("doc_id").agg(*bit_sums)
    fp = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"s_{j}") > 0, F.lit(2**j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fp = term if fp is None else fp + term
    return agg.select("doc_id", fp.alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ ``max_hamming``.

    LSH banding: split the 32-bit fingerprint into 4 bytes; by
    pigeonhole any pair at hamming ≤ 3 shares at least one byte —
    candidates come from 4 equi-joins, never a cross join."""
    sh = simhash(docs)
    bands = []
    for b in range(4):
        bands.append(
            sh.select(
                "doc_id",
                "simhash",
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * 8)
                .bitwiseAND(F.lit(0xFF))
                .alias("byte"),
            )
        )
    banded = bands[0]
    for x in bands[1:]:
        banded = banded.unionByName(x)
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.byte") == F.col("b.byte"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return pairs.withColumn(
        "hamming", F.bit_count(F.expr("sh_a ^ sh_b"))
    ).filter(F.col("hamming") <= max_hamming).select("doc_a", "doc_b", "hamming")


def simhash_sql(max_hamming: int = 3) -> str:
    h = h32_sql("word")
    bit_sums = ",\n         ".join(
        f"sum(CASE WHEN (h // {2**j}) % 2 = 1 THEN 1 ELSE -1 END) AS s_{j}"
        for j in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN s_{j} > 0 THEN CAST({2**j} AS BIGINT) ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    bands = "\nUNION ALL\n".join(
        f"SELECT doc_id, simhash, {b} AS band, "
        f"(simhash // {2 ** (b * 8)}) % 256 AS byte FROM sh"
        for b in range(4)
    )
    return f"""
WITH dw AS (
  SELECT DISTINCT doc_id, word
  FROM (SELECT doc_id, unnest({WORDS_SQL}) AS word FROM documents)
),
dh AS (SELECT doc_id, {h} AS h FROM dw),
agg AS (
  SELECT doc_id,
         {bit_sums}
  FROM dh GROUP BY doc_id
),
sh AS (SELECT doc_id, {fp} AS simhash FROM agg),
banded AS (
{bands}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sh_a, b.simhash AS sh_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.byte = b.byte AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, bit_count(xor(sh_a, sh_b)) AS hamming
FROM pairs
WHERE bit_count(xor(sh_a, sh_b)) <= {max_hamming}
"""


# --------------------------------------------------------------------------
# word-n-gram Jaccard
# --------------------------------------------------------------------------

def ngram_sets(
    docs: DataFrame, n: int = 3, max_df: int | None = None
) -> DataFrame:
    """(doc_id, shingle-hash) distinct pairs for word n-grams.

    ``max_df`` drops shingles appearing in more than that many docs —
    the same hot-boilerplate guard as the MinHash path (a shared header
    shingle otherwise makes the candidate self-join quadratic in its
    document frequency). Opt-in: it changes Jaccard semantics, so it
    gets its own oracle query (``dedup_ngram_capped``)."""
    words = words_col()
    # guard: Spark's sequence(1, 0) DESCENDS ([1, 0]) instead of being
    # empty like DuckDB's generate_series — docs with < n words must
    # produce no shingles, not a truncated one
    idx = F.when(
        F.size(words) >= n, F.sequence(F.lit(1), F.size(words) - (n - 1))
    ).otherwise(F.expr("array()").cast("array<int>"))
    shingles = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i, n))
    )
    ns = docs.select(
        "doc_id",
        F.explode(F.array_distinct(shingles)).alias("shingle"),
    ).withColumn("sh", h32(F.col("shingle"))).select("doc_id", "sh").distinct()
    if max_df is None:
        return ns
    # same inversion as _doc_words: broadcast the tiny hot list and
    # anti-join, instead of broadcasting the ~full shingle vocabulary
    hot = (
        ns.groupBy("sh")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_df)
        .select("sh")
    )
    return ns.join(F.broadcast(hot), "sh", "left_anti")


def _overlap_pairs(
    sets: DataFrame, key: str, num: int, den: int, denom: str
) -> DataFrame:
    """Shared candidate-pair machinery for the set-overlap dedup
    family (n-gram Jaccard, containment, winnowed fingerprints):
    shared-``key`` equi-join → per-pair intersection count → two size
    joins → exact-fraction threshold ``inter·den ≥ denom_sz·num``
    where ``denom`` picks the denominator semantics: ``"union"``
    (Jaccard, na+nb−inter) or ``"min"`` (containment, least(na, nb)).

    Returns (doc_a, doc_b, inter, na, nb) — surviving pairs only.
    """
    sizes = sets.groupBy("doc_id").agg(F.count("*").alias("n_el"))
    pair = (
        sets.alias("x")
        .join(sets.alias("y"), key)
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    denom_sz = (
        F.col("na") + F.col("nb") - F.col("inter")
        if denom == "union"
        else F.least(F.col("na"), F.col("nb"))
    )
    return (
        pair.join(
            sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
                "n_el", "na"
            ),
            "doc_a",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "n_el", "nb"
            ),
            "doc_b",
        )
        .filter(F.col("inter") * F.lit(den) >= denom_sz * F.lit(num))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    jaccard_num: int = 3,
    jaccard_den: int = 10,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over pairs that share ≥1 shingle (the
    shared-shingle equi-join is the candidate generator; ``max_df``
    bounds hot boilerplate shingles at web scale — the per-shingle
    join fan-out is then ≤ max_df² per shingle)."""
    ns = ngram_sets(docs, n, max_df)
    return _overlap_pairs(
        ns, "sh", jaccard_num, jaccard_den, denom="union"
    ).select(
        "doc_a",
        "doc_b",
        "inter",
        (F.col("na") + F.col("nb") - F.col("inter")).alias("union_sz"),
    )


def ngram_jaccard_sql(
    n: int = 3,
    jaccard_num: int = 3,
    jaccard_den: int = 10,
    max_df: int | None = None,
) -> str:
    h = h32_sql("shingle")
    df_guard = (
        f""",
kept AS (SELECT sh FROM ns0 GROUP BY sh HAVING count(*) <= {max_df}),
ns AS (SELECT ns0.doc_id, ns0.sh FROM ns0 JOIN kept USING (sh))"""
        if max_df is not None
        else ",\nns AS (SELECT * FROM ns0)"
    )
    return f"""
WITH w AS (SELECT doc_id, {WORDS_SQL} AS words FROM documents),
shingles AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(words) - {n - 1}, 0)),
                i -> array_to_string(words[i:i+{n - 1}], ' '))) AS shingle
  FROM w
),
ns0 AS (SELECT DISTINCT doc_id, {h} AS sh FROM shingles){df_guard},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM ns GROUP BY 1),
pair AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS inter
  FROM ns x JOIN ns y ON x.sh = y.sh AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b, p.inter,
       sa.n_sh + sb.n_sh - p.inter AS union_sz
FROM pair p
JOIN sizes sa ON sa.doc_id = p.doc_a
JOIN sizes sb ON sb.doc_id = p.doc_b
WHERE p.inter * {jaccard_den} >= (sa.n_sh + sb.n_sh - p.inter) * {jaccard_num}
"""


def containment_pairs(
    docs: DataFrame,
    n: int = 3,
    cont_num: int = 8,
    cont_den: int = 10,
    max_df: int | None = None,
) -> DataFrame:
    """Asymmetric CONTAINMENT near-dup: C(A,B) = |A∩B| / min(|A|,|B|)
    over word n-gram shingle sets — the Broder (1997) containment
    complement of :func:`ngram_jaccard_pairs`. Jaccard misses the
    short-doc-embedded-in-long-doc case (a tweet quoted inside an
    article has tiny Jaccard but containment ≈ 1); training-data
    pipelines flag those as duplicates of the SHORTER side.

    Candidates come from the same shared-shingle equi-join (``max_df``
    bounds hot boilerplate fan-out at web scale); the threshold test
    ``inter·cont_den ≥ min(na,nb)·cont_num`` and the reported
    ``cont_ppb = inter·10⁹ div min(na,nb)`` are exact integers on both
    engines. Scale shape identical to the Jaccard path: equi-join +
    two broadcast-able size joins, nothing quadratic past the df cap.
    """
    ns = ngram_sets(docs, n, max_df)
    return _overlap_pairs(
        ns, "sh", cont_num, cont_den, denom="min"
    ).select(
        "doc_a",
        "doc_b",
        F.col("inter").cast("long").alias("inter"),
        F.col("na").cast("long").alias("na"),
        F.col("nb").cast("long").alias("nb"),
        F.expr("inter * 1000000000 div least(na, nb)")
        .cast("long")
        .alias("cont_ppb"),
    )


def containment_sql(
    n: int = 3,
    cont_num: int = 8,
    cont_den: int = 10,
    max_df: int | None = None,
) -> str:
    """DuckDB twin of :func:`containment_pairs`."""
    h = h32_sql("shingle")
    df_guard = (
        f""",
kept AS (SELECT sh FROM ns0 GROUP BY sh HAVING count(*) <= {max_df}),
ns AS (SELECT ns0.doc_id, ns0.sh FROM ns0 JOIN kept USING (sh))"""
        if max_df is not None
        else ",\nns AS (SELECT * FROM ns0)"
    )
    return f"""
WITH w AS (SELECT doc_id, {WORDS_SQL} AS words FROM documents),
shingles AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(words) - {n - 1}, 0)),
                i -> array_to_string(words[i:i+{n - 1}], ' '))) AS shingle
  FROM w
),
ns0 AS (SELECT DISTINCT doc_id, {h} AS sh FROM shingles){df_guard},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM ns GROUP BY 1),
pair AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS inter
  FROM ns x JOIN ns y ON x.sh = y.sh AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b,
       CAST(p.inter AS BIGINT) AS inter,
       CAST(sa.n_sh AS BIGINT) AS na,
       CAST(sb.n_sh AS BIGINT) AS nb,
       CAST(p.inter * 1000000000 // least(sa.n_sh, sb.n_sh) AS BIGINT)
         AS cont_ppb
FROM pair p
JOIN sizes sa ON sa.doc_id = p.doc_a
JOIN sizes sb ON sb.doc_id = p.doc_b
WHERE p.inter * {cont_den} >= least(sa.n_sh, sb.n_sh) * {cont_num}
"""


def winnow_fingerprints(
    docs: DataFrame, k: int = 3, w: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): from every window of ``w``
    consecutive word-``k``-gram hashes, keep the window MINIMUM; the
    doc's fingerprint is the distinct set of selected hashes. The
    winnowing guarantee: any shared run of ≥ w+k−1 words between two
    docs shares at least one fingerprint — local similarity detection
    with a ~2/(w+1) sampling rate instead of every shingle.

    Entirely map-side array expressions (codegen — no explode until
    the final distinct): O(len·w) comparisons per doc. Docs shorter
    than one full window still emit one fingerprint (window = whole
    doc); docs with < k words emit none.

    Output: (doc_id, fp) distinct pairs — the winnowed analog of
    :func:`ngram_sets`.
    """
    words = words_col()
    kh = F.when(
        F.size(words) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (k - 1)),
            lambda i: h32(F.concat_ws(" ", F.slice(words, i, k))),
        ),
    ).otherwise(F.expr("array()").cast("array<int>"))
    docs_kh = docs.select("doc_id", kh.alias("kh"))
    wins = F.when(
        F.size(F.col("kh")) >= 1,
        F.sequence(
            F.lit(1),
            F.greatest(F.size(F.col("kh")) - (w - 1), F.lit(1)),
        ),
    ).otherwise(F.expr("array()").cast("array<int>"))
    fps = F.array_distinct(
        F.transform(
            wins, lambda i: F.array_min(F.slice(F.col("kh"), i, w))
        )
    )
    return (
        docs_kh.select("doc_id", F.explode(fps).alias("fp"))
        .distinct()
    )


def winnow_pairs(
    docs: DataFrame,
    k: int = 3,
    w: int = 4,
    cont_num: int = 5,
    cont_den: int = 10,
) -> DataFrame:
    """Fingerprint-overlap near-dup pairs over the winnowed sketch:
    shared-fingerprint equi-join (the same candidate shape as the
    shingle paths, on a stream ~2/(w+1) the size), exact containment
    threshold ``inter·cont_den ≥ min(na,nb)·cont_num`` on fingerprint
    counts. The w-window sampling makes this the cheap first pass of
    a MOSS-style plagiarism/boilerplate scan at corpus scale."""
    fp = winnow_fingerprints(docs, k, w)
    return _overlap_pairs(
        fp, "fp", cont_num, cont_den, denom="min"
    ).select(
        "doc_a",
        "doc_b",
        F.col("inter").cast("long").alias("inter"),
        F.col("na").cast("long").alias("na"),
        F.col("nb").cast("long").alias("nb"),
    )


def winnow_sql(
    k: int = 3,
    w: int = 4,
    cont_num: int = 5,
    cont_den: int = 10,
) -> str:
    """DuckDB twin of :func:`winnow_pairs`."""
    h = h32_sql(f"array_to_string(words[i:i+{k - 1}], ' ')")
    return f"""
WITH wrd AS (SELECT doc_id, {WORDS_SQL} AS words FROM documents),
khs AS (
  SELECT doc_id,
         list_transform(
           generate_series(1, greatest(len(words) - {k - 1}, 0)),
           i -> {h}) AS kh
  FROM wrd
),
fp AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(
           generate_series(1, CASE WHEN len(kh) >= 1
                                   THEN greatest(len(kh) - {w - 1}, 1)
                                   ELSE 0 END),
           i -> list_min(kh[i:i+{w - 1}]))) AS fp
  FROM khs
),
sizes AS (SELECT doc_id, count(*) AS n_fp FROM fp GROUP BY 1),
pair AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS inter
  FROM fp x JOIN fp y ON x.fp = y.fp AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b,
       CAST(p.inter AS BIGINT) AS inter,
       CAST(sa.n_fp AS BIGINT) AS na,
       CAST(sb.n_fp AS BIGINT) AS nb
FROM pair p
JOIN sizes sa ON sa.doc_id = p.doc_a
JOIN sizes sb ON sb.doc_id = p.doc_b
WHERE p.inter * {cont_den} >= least(sa.n_fp, sb.n_fp) * {cont_num}
"""


def dup_rate_by_day(docs_days: DataFrame) -> DataFrame:
    """Temporal dedup-health curve: per event day, how much of the
    day's intake is content ALREADY SEEN (on an earlier day, or
    repeated within the day) — the ingest-dashboard face of exact
    dedup, the doc-level analog of :func:`vocab.vocab_growth`'s
    heap's-law curve. A rising ``dup_ppm`` is the classic symptom of
    a crawler re-fetching its own history.

    ``docs_days`` carries (doc_id, text, day_s). Exact integers: a
    doc's identity is the full cross-engine md5 of the text
    (collision-free in practice — a 32-bit hash would fake ~ppm-level
    duplicate mass at 10^8 docs/day);
    ``n_new_hashes`` counts hashes whose FIRST day is that day (one
    min-agg over O(distinct hashes) rows), and
    ``dup_ppm = (n_docs − n_new_hashes)·10⁶ div n_docs``.

    Scale: one hash agg to (hash, first_day) — output bounded by
    distinct contents — then two O(days) aggregates and a tiny join.
    Nothing downstream of the first agg scales with the corpus.
    """
    hashed = docs_days.select(
        "day_s", F.md5(F.col("text").cast("binary")).alias("h")
    )
    per_day = hashed.groupBy("day_s").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    firsts = (
        hashed.groupBy("h")
        .agg(F.min("day_s").alias("day_s"))
        .groupBy("day_s")
        .agg(F.count("*").cast("long").alias("n_new_hashes"))
    )
    return (
        per_day.join(firsts, "day_s", "left")
        .select(
            F.col("day_s").cast("long").alias("day_s"),
            "n_docs",
            F.coalesce(F.col("n_new_hashes"), F.lit(0))
            .cast("long")
            .alias("n_new_hashes"),
        )
        .withColumn(
            "dup_ppm",
            F.expr("(n_docs - n_new_hashes) * 1000000 div n_docs")
            .cast("long"),
        )
    )


def dup_rate_by_day_sql(day_expr: str) -> str:
    """DuckDB twin of :func:`dup_rate_by_day`; ``day_expr`` derives
    the floored event day from a `documents` row."""
    return f"""
SELECT p.day_s,
       p.n_docs,
       CAST(coalesce(f.n_new_hashes, 0) AS BIGINT) AS n_new_hashes,
       CAST((p.n_docs - coalesce(f.n_new_hashes, 0)) * 1000000
            // p.n_docs AS BIGINT) AS dup_ppm
FROM (
  SELECT CAST({day_expr} AS BIGINT) AS day_s,
         CAST(count(*) AS BIGINT)   AS n_docs
  FROM documents GROUP BY 1
) p
LEFT JOIN (
  SELECT day_s, CAST(count(*) AS BIGINT) AS n_new_hashes
  FROM (
    SELECT md5(text) AS h,
           min(CAST({day_expr} AS BIGINT)) AS day_s
    FROM documents GROUP BY 1
  ) GROUP BY 1
) f USING (day_s)
"""
