"""Similarity search over the ``embeddings`` table (vec_id, embedding
float[64], label).

Two paths, as a training-data pipeline needs:

* **Brute-force top-k** — the exactness baseline: quantize each
  embedding to int64 (round(x * 10^4)), integer dot products via
  ``zip_with`` + ``aggregate`` (JVM-side, codegen), rank by
  (dot desc, neighbor asc). Quantization makes every score an exact
  integer → bit-identical DuckDB oracle, no float summation-order
  drift. O(Q × N) — fine for a query subset, the LSH path is the
  scale-out.
* **Hyperplane LSH buckets** — the 100 TB path: 16 deterministic ±1
  hyperplanes (sign from md5 bit of "plane_j:dim_d"), bucket =
  16-bit sign pattern of the quantized dots. Candidates share a
  bucket (equi-join on bucket id), then exact integer dot re-ranks.
  Bucket population is O(N); the join replaces the N² cross product.

Embedding-cosine **near-dup** thresholding stays exact by comparing
dot² · den² ≥ num² · |a|² · |b|² in decimal(38,0)/HUGEINT — no sqrt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT = 10_000  # fixed-point scale for float → int quantization
N_PLANES = 16


def quantized(emb: DataFrame) -> DataFrame:
    """(vec_id, q: array<long>) — embeddings in exact fixed-point."""
    # cast to double BEFORE the multiply: float32 × int stays float32 in
    # Spark and drifts vs DuckDB's double promotion (one observed ULP
    # flip at sf0.001 pair (131, 230))
    return emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * QUANT).cast("long"),
        ).alias("q"),
    )


def quant_sql(extra_cols: tuple[str, ...] = ()) -> str:
    """DuckDB rendering of :func:`quantized`, optionally carrying
    extra passthrough columns (e.g. ``label``)."""
    extra = "".join(f" {c}," for c in extra_cols)
    return f"""
SELECT vec_id,{extra}
       list_transform(embedding,
                      x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT)) AS q
FROM embeddings
"""


QUANT_SQL = quant_sql()


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def topk_dot(emb: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """Exact top-k max-inner-product neighbors for the first
    ``n_queries`` vec_ids. Output (query_id, neighbor_id, dot, rank).

    The query side is tiny → broadcast; the scan side streams once.
    """
    from pyspark.sql import Window

    q = quantized(emb)
    queries = q.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qv")
    )
    scored = (
        q.alias("n")
        .crossJoin(F.broadcast(queries))
        .filter(F.col("n.vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("n.vec_id").alias("neighbor_id"),
            _dot(F.col("qv"), F.col("n.q")).alias("dot"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dot", "rank")
    )


def topk_dot_sql(n_queries: int = 10, k: int = 5) -> str:
    return f"""
WITH q AS ({QUANT_SQL}),
queries AS (SELECT vec_id AS query_id, q AS qv FROM q WHERE vec_id < {n_queries}),
scored AS (
  SELECT query_id, n.vec_id AS neighbor_id,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
                     list_transform(list_zip(qv, n.q),
                                    p -> p[1] * p[2])),
                     (a, b) -> a + b) AS dot
  FROM q n CROSS JOIN queries
  WHERE n.vec_id <> query_id
),
ranked AS (
  SELECT query_id, neighbor_id, dot,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dot DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, dot, rank FROM ranked WHERE rank <= {k}
"""


#: fixed-point scale for the exact cosine ranking key
COS_SCALE = 10**12


def topk_cosine(emb: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """Brute-force cosine top-k, EXACT across engines: rank key is
    ``sign(dot) * floor(dot² · 10^12 / (|a|²·|b|²))`` computed in
    decimal(38,0) — monotone in |cos|·sign, no float division anywhere.
    Output (query_id, neighbor_id, cos_key, rank)."""
    from pyspark.sql import Window

    q = quantized(emb).withColumn("n2", _dot(F.col("q"), F.col("q")))
    queries = q.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qv"),
        F.col("n2").alias("qn2"),
    )
    d38 = "decimal(38,0)"
    dot = _dot(F.col("qv"), F.col("n.q"))
    scored = (
        q.alias("n")
        .crossJoin(F.broadcast(queries))
        .filter(F.col("n.vec_id") != F.col("query_id"))
        .withColumn("dot", dot)
        .withColumn("_num", F.col("dot").cast(d38) * F.col("dot").cast(d38)
                    * F.lit(COS_SCALE).cast(d38))
        .withColumn("_den", F.col("qn2").cast(d38) * F.col("n.n2").cast(d38))
        .withColumn(
            # `div` = exact integral quotient on decimals (no scale-6
            # rounding that plain `/` + floor would introduce)
            "cos_key",
            F.signum("dot").cast("long") * F.expr("_num div _den").cast("long"),
        )
        .select(
            "query_id", F.col("n.vec_id").alias("neighbor_id"), "cos_key"
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_key").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_key", "rank")
    )


def topk_cosine_sql(n_queries: int = 10, k: int = 5) -> str:
    dot = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(list_zip(qv, n.q), p -> p[1] * p[2])), (a, b) -> a + b)"
    )
    return f"""
WITH q0 AS ({QUANT_SQL}),
q AS (SELECT vec_id, q,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(list_zip(q, q), p -> p[1] * p[2])), (a, b) -> a + b) AS n2
      FROM q0),
queries AS (SELECT vec_id AS query_id, q AS qv, n2 AS qn2
            FROM q WHERE vec_id < {n_queries}),
scored AS (
  SELECT query_id, n.vec_id AS neighbor_id,
         {dot} AS dot, qn2, n.n2 AS nn2
  FROM q n CROSS JOIN queries
  WHERE n.vec_id <> query_id
),
keyed AS (
  SELECT query_id, neighbor_id,
         CAST(sign(dot) AS BIGINT)
         * CAST((CAST(dot AS HUGEINT) * CAST(dot AS HUGEINT) * {COS_SCALE})
                // (CAST(qn2 AS HUGEINT) * CAST(nn2 AS HUGEINT)) AS BIGINT)
           AS cos_key
  FROM scored
)
SELECT query_id, neighbor_id, cos_key, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cos_key DESC, neighbor_id ASC) AS rank
  FROM keyed)
WHERE rank <= {k}
"""


def _plane_sign(j: int, d: int) -> int:
    """Deterministic ±1 from md5 parity of 'plane_j:dim_d' — computed in
    Python once (constants baked into the plan AND the oracle SQL)."""
    import hashlib

    h = hashlib.md5(f"plane_{j}:dim_{d}".encode()).hexdigest()
    return 1 if int(h[:8], 16) % 2 == 1 else -1


def plane_matrix(dim: int = 64, n_planes: int = N_PLANES) -> list[list[int]]:
    return [[_plane_sign(j, d) for d in range(dim)] for j in range(n_planes)]


def lsh_buckets(
    emb: DataFrame, dim: int = 64, n_planes: int = N_PLANES
) -> DataFrame:
    """(vec_id, bucket) — n_planes-bit hyperplane sign pattern, all
    JVM-side. Each plane's signed sum is an exact integer; bucket bit j
    is set iff sum_j > 0. Fewer planes = coarser lists (the IVF-style
    nlist knob); more = finer near-dup buckets."""
    planes = plane_matrix(dim, n_planes)
    q = quantized(emb)
    bucket = None
    for j, signs in enumerate(planes):
        sv = F.array(*[F.lit(s) for s in signs])
        dot_j = _dot(F.col("q"), sv)
        bit = F.when(dot_j > 0, F.lit(2**j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bit if bucket is None else bucket + bit
    return q.select("vec_id", bucket.alias("bucket"))


def lsh_bucket_pairs(
    emb: DataFrame, dim: int = 64, max_bucket: int | None = None
) -> DataFrame:
    """Candidate pairs sharing an LSH bucket, re-ranked by exact dot.
    Output (vec_a, vec_b, bucket, dot). ``max_bucket`` caps bucket width
    before the self-join (see ``_cap_buckets``)."""
    b = lsh_buckets(emb, dim)
    if max_bucket is not None:
        b = _cap_buckets(b, ["bucket"], max_bucket)
    q = quantized(emb)
    a_side = b.join(q, "vec_id").select(
        F.col("vec_id").alias("vec_a"), "bucket", F.col("q").alias("qa")
    )
    b_side = b.join(q, "vec_id").select(
        F.col("vec_id").alias("vec_b"), "bucket", F.col("q").alias("qb")
    )
    return (
        a_side.join(b_side, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a", "vec_b", "bucket", _dot(F.col("qa"), F.col("qb")).alias("dot")
        )
    )


def lsh_bucket_pairs_sql(dim: int = 64) -> str:
    planes = plane_matrix(dim)
    terms = []
    for j, signs in enumerate(planes):
        lst = ", ".join(str(s) for s in signs)
        terms.append(
            f"(CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(list_zip(q, [{lst}]), p -> p[1] * p[2])), "
            f"(a, b) -> a + b) > 0 THEN CAST({2**j} AS BIGINT) ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    return f"""
WITH q AS ({QUANT_SQL}),
b AS (SELECT vec_id, {bucket} AS bucket, q FROM q)
SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b, a.bucket,
       list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(list_zip(a.q, b2.q), p -> p[1] * p[2])),
                   (x, y) -> x + y) AS dot
FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
"""


def _hamming_masks(n_bits: int, max_hamming: int) -> list[int]:
    """All n_bits-wide masks with ≤ max_hamming set bits, ascending —
    XORing a bucket with these enumerates its hamming ball (the probe
    lists). Python-side constant: e.g. 6 bits, h≤2 → 22 masks."""
    from itertools import combinations

    out = [0]
    for h in range(1, max_hamming + 1):
        for bits in combinations(range(n_bits), h):
            out.append(sum(1 << b for b in bits))
    return sorted(out)


def ivf_probe_topk(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    max_hamming: int = 2,
    dim: int = 64,
    n_planes: int = 6,
) -> DataFrame:
    """IVF-style approximate top-k: coarse hyperplane buckets
    (2^n_planes inverted lists — the nlist knob) ; a query probes its
    own list plus lists within hamming ``max_hamming`` (the nprobe
    knob), then exact integer dot re-ranks the candidates. Scan cost is
    O(candidates), not O(N), once the bucket index exists.
    Output (query_id, neighbor_id, dot, rank) — exact integers."""
    from pyspark.sql import Window

    b = lsh_buckets(emb, dim, n_planes)
    q = quantized(emb).join(b, "vec_id")
    queries = q.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qv"),
        F.col("bucket").alias("qb"),
    )
    # inverted-list probe: explode each query into its probe lists (all
    # buckets within hamming max_hamming of its own — sum C(n_planes, i)
    # masks, a Python-side constant), then EQUI-JOIN on bucket. The scan
    # side is touched only on probed lists; with the table bucketed /
    # partitioned by `bucket` this prunes, which the old
    # crossJoin+bit_count filter (full scan per query batch) never could.
    masks = _hamming_masks(n_planes, max_hamming)
    probed = (
        queries.withColumn(
            "mask",
            F.explode(F.array(*[F.lit(m).cast("long") for m in masks])),
        )
        .withColumn("bucket", F.col("mask").bitwiseXOR(F.col("qb")))
        .drop("qb", "mask")
    )
    cand = (
        q.alias("n")
        .join(F.broadcast(probed), "bucket")
        .filter(F.col("n.vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("n.vec_id").alias("neighbor_id"),
            _dot(F.col("qv"), F.col("n.q")).alias("dot"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dot", "rank")
    )


def ivf_probe_topk_sql(
    n_queries: int = 10, k: int = 5, max_hamming: int = 2, dim: int = 64,
    n_planes: int = 6,
) -> str:
    planes = plane_matrix(dim, n_planes)
    terms = []
    for j, signs in enumerate(planes):
        lst = ", ".join(str(s) for s in signs)
        terms.append(
            f"(CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(list_zip(q, [{lst}]), p -> p[1] * p[2])), "
            f"(a, b) -> a + b) > 0 THEN CAST({2**j} AS BIGINT) ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    dot = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(list_zip(qv, n.q), p -> p[1] * p[2])), (a, b) -> a + b)"
    )
    return f"""
WITH q0 AS ({QUANT_SQL}),
b AS (SELECT vec_id, q, {bucket} AS bucket FROM q0),
queries AS (SELECT vec_id AS query_id, q AS qv, bucket AS qb
            FROM b WHERE vec_id < {n_queries}),
cand AS (
  SELECT query_id, n.vec_id AS neighbor_id, {dot} AS dot
  FROM b n CROSS JOIN queries
  WHERE n.vec_id <> query_id
    AND bit_count(xor(n.bucket, qb)) <= {max_hamming}
)
SELECT query_id, neighbor_id, dot, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY dot DESC, neighbor_id ASC) AS rank
  FROM cand)
WHERE rank <= {k}
"""


#: hyperplane-sign banding for near-dup pair generation: 16 sign bits
#: split into 4 bands × 4 bits; pairs agreeing on ANY band become
#: candidates (an equi-join per band — never a cross product). At
#: cos = 0.9 each bit agrees w.p. ≈ 1 - θ/π ≈ 0.856, so
#: P(some band matches) ≈ 1 - (1 - 0.856⁴)⁴ ≈ 0.95 — recall is
#: asserted against the brute-force baseline in tests.
N_SIM_BANDS = 4
BAND_BITS = N_PLANES // N_SIM_BANDS


def _banded_buckets(emb: DataFrame, dim: int = 64) -> DataFrame:
    """(vec_id, band, band_bits) — the 16-bit hyperplane signature cut
    into N_SIM_BANDS equi-joinable band keys."""
    b = lsh_buckets(emb, dim, N_PLANES)
    bands = [
        b.select(
            "vec_id",
            F.lit(i).alias("band"),
            F.shiftright(F.col("bucket"), i * BAND_BITS)
            .bitwiseAND(F.lit((1 << BAND_BITS) - 1))
            .alias("band_bits"),
        )
        for i in range(N_SIM_BANDS)
    ]
    out = bands[0]
    for x in bands[1:]:
        out = out.unionByName(x)
    return out


def _cap_buckets(df: DataFrame, keys: list[str], max_bucket: int) -> DataFrame:
    """Drop members of (keys) buckets wider than ``max_bucket`` BEFORE a
    self-join — the same boundedness knob as ``dedup.lsh_candidate_pairs
    (max_bucket=...)``: one window count on the join key (AQE coalesces
    the exchange with the join's), so per-bucket pair fan-out is
    ≤ max_bucket² even on a boilerplate-dense semantic cluster."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys)
    return (
        df.withColumn("bucket_n", F.count("*").over(w))
        .filter(F.col("bucket_n") <= max_bucket)
        .drop("bucket_n")
    )


def cosine_near_dups(
    emb: DataFrame,
    num: int = 9,
    den: int = 10,
    dim: int = 64,
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs with cos ≥ num/den.

    Candidates from banded hyperplane LSH (equi-join on (band,
    band_bits) — O(bucket²) per band value, never O(N²)); the exact
    integer threshold dot²·den² ≥ num²·|a|²·|b|² (decimal(38,0), no
    sqrt) then keeps true near-dups only. Same banding in the oracle
    SQL, so results are deterministic and hash-comparable; recall vs
    the brute-force baseline is covered by ``cosine_near_dups_exact``
    + the recall pytest. Output (vec_a, vec_b, dot) integers.

    ``max_bucket`` (opt-in, own oracle query): cap the width of a
    (band, band_bits) bucket before the self-join — without it one
    dense semantic cluster of B boilerplate embeddings fans out O(B²)
    candidate pairs."""
    banded = _banded_buckets(emb, dim)
    if max_bucket is not None:
        banded = _cap_buckets(banded, ["band", "band_bits"], max_bucket)
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            ["band", "band_bits"],
        )
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
        )
        .distinct()
    )
    q = quantized(emb).withColumn("n2", _dot(F.col("q"), F.col("q")))
    a = q.select(
        F.col("vec_id").alias("vec_a"), F.col("q").alias("qa"),
        F.col("n2").alias("na2"),
    )
    b = q.select(
        F.col("vec_id").alias("vec_b"), F.col("q").alias("qb"),
        F.col("n2").alias("nb2"),
    )
    d38 = "decimal(38,0)"
    pairs = (
        cand.join(a, "vec_a")
        .join(b, "vec_b")
        .withColumn("dot", _dot(F.col("qa"), F.col("qb")))
    )
    return pairs.filter(
        (F.col("dot") > 0)
        & (
            F.col("dot").cast(d38) * F.col("dot").cast(d38) * F.lit(den * den)
            >= F.col("na2").cast(d38) * F.col("nb2").cast(d38) * F.lit(num * num)
        )
    ).select("vec_a", "vec_b", "dot")


def cosine_near_dups_exact(
    emb: DataFrame, num: int = 9, den: int = 10
) -> DataFrame:
    """Brute-force all-pairs baseline (explicit O(N²) — small-N recall
    oracle for the LSH path above; NOT for scale use)."""
    q = quantized(emb).withColumn("n2", _dot(F.col("q"), F.col("q")))
    a = q.select(
        F.col("vec_id").alias("vec_a"), F.col("q").alias("qa"),
        F.col("n2").alias("na2"),
    )
    b = q.select(
        F.col("vec_id").alias("vec_b"), F.col("q").alias("qb"),
        F.col("n2").alias("nb2"),
    )
    d38 = "decimal(38,0)"
    pairs = (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("dot", _dot(F.col("qa"), F.col("qb")))
    )
    return pairs.filter(
        (F.col("dot") > 0)
        & (
            F.col("dot").cast(d38) * F.col("dot").cast(d38) * F.lit(den * den)
            >= F.col("na2").cast(d38) * F.col("nb2").cast(d38) * F.lit(num * num)
        )
    ).select("vec_a", "vec_b", "dot")


def cosine_near_dups_sql(
    num: int = 9,
    den: int = 10,
    dim: int = 64,
    max_bucket: int | None = None,
) -> str:
    planes = plane_matrix(dim, N_PLANES)
    terms = []
    for j, signs in enumerate(planes):
        lst = ", ".join(str(s) for s in signs)
        terms.append(
            f"(CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(list_zip(q, [{lst}]), p -> p[1] * p[2])), "
            f"(a, b) -> a + b) > 0 THEN CAST({2**j} AS BIGINT) ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    band_rows = "\nUNION ALL\n".join(
        f"SELECT vec_id, {i} AS band, "
        f"(bucket // {1 << (i * BAND_BITS)}) % {1 << BAND_BITS} AS band_bits "
        f"FROM bk"
        for i in range(N_SIM_BANDS)
    )
    dot = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(list_zip({x}, {y}), p -> p[1] * p[2])), "
        "(a, b) -> a + b)"
    )
    return f"""
WITH q AS ({QUANT_SQL}),
qn AS (SELECT vec_id, q, {dot.format(x="q", y="q")} AS n2 FROM q),
bk AS (SELECT vec_id, {bucket} AS bucket FROM q),
banded_all AS (
{band_rows}
),
banded AS (
  SELECT vec_id, band, band_bits FROM (
    SELECT *, count(*) OVER (PARTITION BY band, band_bits) AS bucket_n
    FROM banded_all
  ) WHERE bucket_n <= {max_bucket if max_bucket is not None else 'bucket_n'}
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.band_bits = b.band_bits
   AND a.vec_id < b.vec_id
)
SELECT c.vec_a, c.vec_b, {dot.format(x="a.q", y="b.q")} AS dot
FROM cand c
JOIN qn a ON a.vec_id = c.vec_a
JOIN qn b ON b.vec_id = c.vec_b
WHERE {dot.format(x="a.q", y="b.q")} > 0
  AND CAST({dot.format(x="a.q", y="b.q")} AS HUGEINT)
      * CAST({dot.format(x="a.q", y="b.q")} AS HUGEINT) * {den * den}
      >= CAST(a.n2 AS HUGEINT) * CAST(b.n2 AS HUGEINT) * {num * num}
"""


def source_centroid_d2(docs: DataFrame, emb: DataFrame) -> DataFrame:
    """Pairwise squared distance between per-source embedding CENTROIDS
    — the embedding-space mixture monitor ("are two ingestion sources
    semantically converging/diverging?"), the vector twin of
    :func:`~pyreshaper_spark.operators.vocab.source_token_tvd`.

    Exact fixed-point integers, no division: with per-source per-dim
    sums s_d (over :func:`quantized` vectors) and row counts n,

        (n_a * n_b)^2 * ||mu_a - mu_b||^2
            = sum_d (s_ad * n_b - s_bd * n_a)^2

    so the engine ships ``d2_num`` = that decimal(38,0) sum plus both
    counts; the float face is a driver-side division. Domain: exact
    while n_a*n_b*QUANT < ~10^19 per dim (≈10^7 rows/source at unit-norm
    embeddings); beyond that pre-average per shard or accept the float
    finisher.

    Scale shape: one posexplode (rows x dims) collapsed by partial agg
    to |S| x D rows, then a dim equi-join over that tiny relation with
    broadcast totals — the corpus is read once, everything downstream
    is O(|S| x D).
    """
    dec = "decimal(38,0)"
    q = quantized(emb)
    base = docs.select(F.col("doc_id").alias("vec_id"), "source").join(
        q, "vec_id", "left"
    )
    per = (
        base.filter(F.col("q").isNotNull())
        .select("source", F.posexplode("q").alias("dim", "v"))
        .groupBy("source", "dim")
        .agg(F.sum("v").alias("s"))
    )
    # totals over ALL document sources (embedded-row count may be 0):
    # a source with no vectors must still appear in every pair — with a
    # NULL d2_num ("centroid undefined"), never silently absent; the
    # token-TVD twin restores missing pairs the same way
    tot = base.groupBy("source").agg(
        F.count("q").cast("long").alias("n")
    )
    a = per.select(
        F.col("source").alias("src_a"), "dim", F.col("s").alias("s_a")
    )
    b = per.select(
        F.col("source").alias("src_b"), "dim", F.col("s").alias("s_b")
    )
    na = tot.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    nb = tot.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    diff = (
        F.col("s_a").cast(dec) * F.col("n_b").cast(dec)
        - F.col("s_b").cast(dec) * F.col("n_a").cast(dec)
    )
    d2 = (
        a.join(b, "dim")
        .filter(F.col("src_a") < F.col("src_b"))
        .join(F.broadcast(na), "src_a")
        .join(F.broadcast(nb), "src_b")
        .groupBy("src_a", "src_b")
        .agg(F.sum(diff * diff).cast(dec).alias("d2_num"))
    )
    grid = na.join(F.broadcast(nb), na.src_a < nb.src_b)
    return grid.join(d2, ["src_a", "src_b"], "left").select(
        "src_a", "src_b", "d2_num", "n_a", "n_b"
    )


def source_centroid_d2_sql(dim: int = 64) -> str:
    """DuckDB twin of :func:`source_centroid_d2` (fixed ``dim`` — the
    fixture's embedding width; DuckDB lacks lateral unnest-with-
    ordinality, so dims come from a constant generate_series)."""
    return f"""
WITH q AS ({QUANT_SQL}),
base AS (
  SELECT d.source, q.q
  FROM documents d LEFT JOIN q ON q.vec_id = d.doc_id
),
per AS (
  SELECT source, i AS dim, CAST(sum(q[i]) AS BIGINT) AS s
  FROM base CROSS JOIN generate_series(1, {dim}) AS t(i)
  WHERE q IS NOT NULL
  GROUP BY 1, 2
),
tot AS (
  SELECT source, CAST(count(q) AS BIGINT) AS n FROM base GROUP BY 1
),
d2 AS (
  SELECT a.src_a, a.src_b, CAST(sum(a.d * a.d) AS DECIMAL(38,0)) AS d2_num
  FROM (
    SELECT pa.source AS src_a, pb.source AS src_b,
           CAST(pa.s AS DECIMAL(38,0)) * tb.n
             - CAST(pb.s AS DECIMAL(38,0)) * ta.n AS d
    FROM per pa
    JOIN per pb ON pa.dim = pb.dim AND pa.source < pb.source
    JOIN tot ta ON ta.source = pa.source
    JOIN tot tb ON tb.source = pb.source
  ) a
  GROUP BY 1, 2
)
SELECT ta.source AS src_a, tb.source AS src_b,
       d2.d2_num, ta.n AS n_a, tb.n AS n_b
FROM tot ta
JOIN tot tb ON ta.source < tb.source
LEFT JOIN d2 ON d2.src_a = ta.source AND d2.src_b = tb.source
"""


#: bits packed per code word — 32 keeps every shift result positive
#: (DuckDB overflow-checks `1::BIGINT << 63`; Spark would wrap silently)
BINQ_WORD = 32


def binary_codes(emb: DataFrame, dim: int = 64) -> DataFrame:
    """1-bit (sign) quantization: (vec_id, code array<bigint>, q, n2)
    with ceil(dim/32) packed 32-bit words per vector — the
    binary-sketch ANN index (SimHash-for-vectors): 64 float32 dims
    become 8 bytes, a 32× scan-size cut, and Hamming distance on the
    codes is a provable cosine-angle estimator (hyperplane LSH with
    the coordinate axes as planes).
    """
    import math

    n_words = math.ceil(dim / BINQ_WORD)
    q = quantized(emb).withColumn("n2", _dot(F.col("q"), F.col("q")))
    code = F.expr(
        f"""transform(sequence(0, {n_words - 1}), w ->
              aggregate(zip_with(q, sequence(0, {dim - 1}), (x, i) ->
                if(i div {BINQ_WORD} = w AND x > 0,
                   shiftleft(cast(1 as bigint), i % {BINQ_WORD}),
                   cast(0 as bigint))),
                cast(0 as bigint), (a, b) -> a | b))"""
    )
    return q.select("vec_id", code.alias("code"), "q", "n2")


def _hamming(c1, c2) -> F.Column:
    """Σ_words bit_count(xor) — stays in whole-stage codegen."""
    return F.aggregate(
        F.zip_with(c1, c2, lambda a, b: F.bit_count(a.bitwiseXOR(b))),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v.cast("long"),
    )


def binq_topk(
    emb: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    shortlist: int = 20,
    dim: int = 64,
) -> DataFrame:
    """Binary-quantization ANN: exhaustive Hamming scan over the packed
    sign codes (the cheap pass — 8 bytes/vector instead of 512), then
    EXACT integer-dot re-rank of each query's ``shortlist`` best
    Hamming candidates. Output (query_id, neighbor_id, dot, rank).

    Scale shape: the code table is O(N) and 64× smaller than the
    vectors; queries broadcast; the Hamming pass is pure codegen
    (bit_count over packed words). The shortlist re-rank touches full
    vectors only via a broadcast-bounded semi-selection (Q × shortlist
    rows). Ties break (hamming asc, neighbor asc) and (dot desc,
    neighbor asc) — engine-portable determinism.
    """
    from pyspark.sql import Window

    c = binary_codes(emb, dim=dim)
    queries = c.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("code").alias("qcode"),
        F.col("q").alias("qv"),
    )
    # cheap pass: CODES ONLY — the full vectors never enter the
    # exhaustive scan (that is the whole point of the 8-byte sketch)
    hammed = (
        c.select("vec_id", "code").alias("n")
        .crossJoin(F.broadcast(queries.select("query_id", "qcode")))
        .filter(F.col("n.vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("n.vec_id").alias("neighbor_id"),
            _hamming(F.col("qcode"), F.col("n.code")).alias("hamming"),
        )
    )
    wh = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id").asc()
    )
    short = hammed.withColumn("hrank", F.row_number().over(wh)).filter(
        F.col("hrank") <= shortlist
    )
    # exact re-rank: the Q×shortlist pair list BROADCASTS back onto the
    # vector table, so full vectors are dotted only for the shortlist
    rer = (
        c.select(F.col("vec_id").alias("neighbor_id"),
                 F.col("q").alias("nv"))
        .join(
            F.broadcast(short.select("query_id", "neighbor_id")),
            "neighbor_id",
        )
        .join(F.broadcast(queries.select("query_id", "qv")), "query_id")
        .select(
            "query_id", "neighbor_id",
            _dot(F.col("qv"), F.col("nv")).alias("dot"),
        )
    )
    wd = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("neighbor_id").asc()
    )
    return (
        rer.withColumn("rank", F.row_number().over(wd))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dot", "rank")
    )


def binq_topk_sql(
    n_queries: int = 10, k: int = 5, shortlist: int = 20, dim: int = 64
) -> str:
    """DuckDB twin of :func:`binq_topk` (same packing, same tie rules)."""
    import math

    n_words = math.ceil(dim / BINQ_WORD)
    dot = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(list_zip(qs.qv, nv.q), p -> p[1] * p[2])), "
        "(a, b) -> a + b)"
    )
    return f"""
WITH q0 AS ({QUANT_SQL}),
c AS (
  SELECT vec_id, q,
         list_transform(range(0, {n_words}), w ->
           list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(list_zip(q, range(0, {dim})), p ->
               CASE WHEN p[2] // {BINQ_WORD} = w AND p[1] > 0
                    THEN (CAST(1 AS BIGINT) << (p[2] % {BINQ_WORD}))
                    ELSE CAST(0 AS BIGINT) END)),
             (a, b) -> a | b)) AS code
  FROM q0),
queries AS (SELECT vec_id AS query_id, code AS qcode, q AS qv
            FROM c WHERE vec_id < {n_queries}),
hammed AS (
  SELECT query_id, n.vec_id AS neighbor_id,
         list_reduce(list_transform(list_zip(qcode, n.code),
                     p -> CAST(bit_count(xor(p[1], p[2])) AS BIGINT)),
                     (a, b) -> a + b) AS hamming
  FROM c n CROSS JOIN queries
  WHERE n.vec_id <> query_id),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY hamming ASC, neighbor_id ASC)
             AS hrank
    FROM hammed)
  WHERE hrank <= {shortlist}),
rer AS (
  SELECT s.query_id, s.neighbor_id, {dot} AS dot
  FROM short s
  JOIN c nv ON nv.vec_id = s.neighbor_id
  JOIN queries qs ON qs.query_id = s.query_id)
SELECT query_id, neighbor_id, dot, rank FROM (
  SELECT query_id, neighbor_id, dot,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dot DESC, neighbor_id ASC) AS rank
  FROM rer)
WHERE rank <= {k}
"""


def emb_norm_stats(emb: DataFrame) -> DataFrame:
    """Embedding-quality stats per label group: n vectors, Σ‖q‖²,
    min/max ‖q‖² over the exact fixed-point grid — the ingest health
    check for an embedding column (a batch of zero / exploding norms is
    the classic symptom of an encoder regression or a bad cast
    upstream; collapsed per-group norm spread flags constant vectors).

    ‖q‖² is the exact integer self-dot of the quantized vector (same
    grid as every ANN operator here); sums are decimal(38,0).
    One map-side projection + one partial+final hash agg keyed by the
    small label set — no join, no window, single scan.
    """
    q = emb.select(
        F.col("label").cast("long").alias("label"),
        _dot(
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * QUANT).cast("long"),
            ),
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * QUANT).cast("long"),
            ),
        ).alias("n2"),
    )
    return q.groupBy("label").agg(
        F.count("*").cast("long").alias("n_vecs"),
        F.sum(F.col("n2").cast("decimal(38,0)"))
        .cast("decimal(38,0)").alias("sum_norm2"),
        F.min("n2").cast("long").alias("min_norm2"),
        F.max("n2").cast("long").alias("max_norm2"),
    )


def emb_norm_stats_sql() -> str:
    """DuckDB twin of :func:`emb_norm_stats` over the `embeddings`
    view."""
    return f"""
SELECT CAST(label AS BIGINT) AS label,
       count(*)              AS n_vecs,
       CAST(sum(CAST(n2 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sum_norm2,
       CAST(min(n2) AS BIGINT) AS min_norm2,
       CAST(max(n2) AS BIGINT) AS max_norm2
FROM (
  SELECT label,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
                     list_transform(q, x -> x * x)),
                     (a, b) -> a + b) AS n2
  FROM ({quant_sql(("label",))})
)
GROUP BY 1
"""


def centroid_drift(
    docs_days: DataFrame, emb: DataFrame, day_s: int = 86400
) -> DataFrame:
    """Day-over-day movement of each source's embedding CENTROID — the
    semantic-drift monitor of an ingestion pipeline ("did this feed's
    content shift overnight?"), the time-resolved sibling of
    :func:`source_centroid_d2`.

    ``docs_days`` carries (vec_id, source, day_s-floored event day);
    per (source, day) the quantized per-dim sums s_d and count n are
    aggregated, consecutive days pair by an equi-join on (source, dim,
    day == prev_day + day_s), and the comparable output is the exact
    cross-multiplied numerator

        d2_num = Σ_d (s_cur_d · n_prev − s_prev_d · n_cur)²

    (true squared centroid distance = d2_num / (n_cur·n_prev)² — a
    consumer-side float). Same decimal(38,0) domain bound as
    :func:`source_centroid_d2`.

    Scale: one posexplode collapsed by partial agg to |S|·days·D rows,
    then equi-joins over that tiny relation. Days with no previous
    embedded day are absent (no pair to compare).
    """
    dec = "decimal(38,0)"
    base = docs_days.join(quantized(emb), "vec_id")
    per = (
        base.select("source", "day_s", F.posexplode("q").alias("dim", "v"))
        .groupBy("source", "day_s", "dim")
        .agg(F.sum("v").alias("s"))
    )
    tot = base.groupBy("source", "day_s").agg(
        F.count("*").cast("long").alias("n")
    )
    cur = per.alias("c")
    prv = per.select(
        "source",
        (F.col("day_s") + day_s).alias("day_s"),
        "dim",
        F.col("s").alias("s_prev"),
    ).alias("p")
    ntot = tot.alias("tc")
    nprv = tot.select(
        "source",
        (F.col("day_s") + day_s).alias("day_s"),
        F.col("n").alias("n_prev"),
    ).alias("tp")
    joined = (
        cur.join(prv, ["source", "day_s", "dim"])
        .join(F.broadcast(ntot), ["source", "day_s"])
        .join(F.broadcast(nprv), ["source", "day_s"])
    )
    diff = (
        F.col("s").cast(dec) * F.col("n_prev").cast(dec)
        - F.col("s_prev").cast(dec) * F.col("n").cast(dec)
    )
    return (
        joined.groupBy("source", "day_s")
        .agg(
            F.first("n").alias("n_cur"),
            F.first("n_prev").alias("n_prev"),
            F.sum(diff * diff).cast(dec).alias("d2_num"),
        )
        .select(
            "source",
            F.col("day_s").cast("long").alias("day_s"),
            F.col("n_cur").cast("long").alias("n_cur"),
            F.col("n_prev").cast("long").alias("n_prev"),
            "d2_num",
        )
    )


def centroid_drift_sql(
    day_expr: str, day_s: int = 86400, dim: int = 64
) -> str:
    """DuckDB twin of :func:`centroid_drift`. ``day_expr`` is the SQL
    expression deriving the floored event day from a `documents` row
    (the fixture's Lehmer spread, day-floored)."""
    return f"""
WITH q AS ({QUANT_SQL}),
base AS (
  SELECT d.source, {day_expr} AS day_s, q.q
  FROM documents d JOIN q ON q.vec_id = d.doc_id
),
per AS (
  SELECT source, day_s, i AS dim, CAST(sum(q[i]) AS BIGINT) AS s
  FROM base CROSS JOIN generate_series(1, {dim}) AS t(i)
  GROUP BY 1, 2, 3
),
tot AS (
  SELECT source, day_s, CAST(count(*) AS BIGINT) AS n
  FROM base GROUP BY 1, 2
)
SELECT c.source,
       CAST(c.day_s AS BIGINT) AS day_s,
       CAST(tc.n AS BIGINT)    AS n_cur,
       CAST(tp.n AS BIGINT)    AS n_prev,
       CAST(sum((CAST(c.s AS DECIMAL(38,0)) * tp.n
                 - CAST(p.s AS DECIMAL(38,0)) * tc.n)
                * (CAST(c.s AS DECIMAL(38,0)) * tp.n
                   - CAST(p.s AS DECIMAL(38,0)) * tc.n))
            AS DECIMAL(38,0)) AS d2_num
FROM per c
JOIN per p ON p.source = c.source AND p.dim = c.dim
          AND p.day_s + {day_s} = c.day_s
JOIN tot tc ON tc.source = c.source AND tc.day_s = c.day_s
JOIN tot tp ON tp.source = c.source AND tp.day_s + {day_s} = c.day_s
GROUP BY 1, 2, 3, 4
"""


def hard_negatives(
    emb: DataFrame, n_queries: int = 10, k: int = 5
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the ``k`` highest-dot-product neighbors whose ``label``
    DIFFERS from the query's — the most-confusable wrong-class
    examples a contrastive/embedding trainer pairs with each anchor
    (the closest positives are easy; the closest NEGATIVES carry the
    gradient signal). Same exact fixed-point dot as :func:`topk_dot`;
    the label inequality is the only new predicate.

    Output (query_id, query_label, neighbor_id, dot, rank), rank ≤ k
    by (dot desc, neighbor_id asc).

    Scale shape: identical to :func:`topk_dot` — the query side is
    tiny and broadcast, the corpus streams once, and the rank ≤ k
    filter plans as WindowGroupLimit (each map task forwards at most
    k rows per query). For corpus-scale query sets the shortlist
    would come from the ANN family (IVF/PQ/LSH) with this label mask
    applied at rerank; this operator is the exact per-anchor face.
    """
    from pyspark.sql import Window

    # one projection carries label + quantized vector (the DuckDB twin
    # quant_sql(("label",)) shape) — no second scan, no re-join
    q = emb.select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * QUANT).cast("long"),
        ).alias("q"),
    )
    queries = q.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("q").alias("qv"),
    )
    scored = (
        q.alias("n")
        .crossJoin(F.broadcast(queries))
        .filter(
            (F.col("n.vec_id") != F.col("query_id"))
            & (F.col("n.label") != F.col("query_label"))
        )
        .select(
            "query_id",
            "query_label",
            F.col("n.vec_id").alias("neighbor_id"),
            _dot(F.col("qv"), F.col("n.q")).alias("dot"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("query_label").cast("long").alias("query_label"),
            "neighbor_id",
            "dot",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def hard_negatives_sql(n_queries: int = 10, k: int = 5) -> str:
    """DuckDB twin of :func:`hard_negatives`."""
    return f"""
WITH q AS ({quant_sql(("label",))}),
queries AS (
  SELECT vec_id AS query_id, label AS query_label, q AS qv
  FROM q WHERE vec_id < {n_queries}
),
scored AS (
  SELECT query_id, query_label, n.vec_id AS neighbor_id,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
                     list_transform(list_zip(qv, n.q),
                                    p -> p[1] * p[2])),
                     (a, b) -> a + b) AS dot
  FROM q n CROSS JOIN queries
  WHERE n.vec_id <> query_id AND n.label <> query_label
),
ranked AS (
  SELECT query_id, query_label, neighbor_id, dot,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dot DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, CAST(query_label AS BIGINT) AS query_label,
       neighbor_id, dot, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


#: fixed-point scale for reciprocal-rank-fusion contributions: the
#: per-list contribution of a rank-r hit is RRF_SCALE div (c + r) —
#: integer truncation, identical in Spark (`div`) and DuckDB (`//`).
RRF_SCALE = 10**9


def rrf_fuse(
    lex: DataFrame, sem: DataFrame, k: int = 5, c: int = 60
) -> DataFrame:
    """Reciprocal-rank fusion of a LEXICAL ranked neighbor list
    (``dedup.minhash_topk``: doc_id, neighbor, rank) and a SEMANTIC
    one (:func:`topk_cosine` / :func:`topk_dot`: query_id,
    neighbor_id, rank) into one hybrid retrieval ranking — the
    standard two-tower fusion (Cormack et al.'s RRF) every hybrid
    search stack runs, here with exact integer scores:
    ``score = Σ_lists RRF_SCALE div (c + rank)`` (a list not
    containing the pair contributes 0).

    Output (query_id, neighbor_id, rrf, rank), rank ≤ k by
    (rrf desc, neighbor_id asc). Document ids and vector ids are
    linked by the corpus convention ``vec_id = doc_id`` (the same
    linkage ``emb_centroid_drift`` uses).

    Scale shape: both inputs are already rank-≤-k lists (O(queries·k)
    rows), so the fusion is a full-outer equi-join of two tiny
    relations plus one WindowGroupLimit ranking — negligible next to
    the retrieval stages that produced them.
    """
    from pyspark.sql import Window

    L = lex.select(
        F.col("doc_id").cast("long").alias("query_id"),
        F.col("neighbor").cast("long").alias("neighbor_id"),
        F.col("rank").alias("r_lex"),
    )
    S = sem.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        F.col("rank").alias("r_sem"),
    )
    j = L.join(S, ["query_id", "neighbor_id"], "full")
    score = F.coalesce(
        F.expr(f"{RRF_SCALE} div ({c} + r_lex)"), F.lit(0).cast("long")
    ) + F.coalesce(
        F.expr(f"{RRF_SCALE} div ({c} + r_sem)"), F.lit(0).cast("long")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("neighbor_id").asc()
    )
    return (
        j.withColumn("rrf", score.cast("long"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rrf",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def rrf_fuse_sql(
    lex_sql: str, sem_sql: str, k: int = 5, c: int = 60
) -> str:
    """DuckDB twin of :func:`rrf_fuse`. ``lex_sql`` must yield
    (doc_id, neighbor, rank); ``sem_sql`` (query_id, neighbor_id,
    rank) — the two operators' own oracle renderings."""
    return f"""
lexr AS (
  SELECT CAST(doc_id AS BIGINT) AS query_id,
         CAST(neighbor AS BIGINT) AS neighbor_id,
         rank AS r_lex
  FROM ({lex_sql})
),
semr AS (
  SELECT CAST(query_id AS BIGINT) AS query_id,
         CAST(neighbor_id AS BIGINT) AS neighbor_id,
         rank AS r_sem
  FROM ({sem_sql})
),
fused AS (
  SELECT coalesce(lexr.query_id, semr.query_id)       AS query_id,
         coalesce(lexr.neighbor_id, semr.neighbor_id) AS neighbor_id,
         CAST(coalesce({RRF_SCALE} // ({c} + r_lex), 0)
              + coalesce({RRF_SCALE} // ({c} + r_sem), 0) AS BIGINT)
           AS rrf
  FROM lexr FULL OUTER JOIN semr
    ON lexr.query_id = semr.query_id
   AND lexr.neighbor_id = semr.neighbor_id
)
SELECT query_id, neighbor_id, rrf,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf DESC, neighbor_id ASC)
            AS BIGINT) AS rank
FROM fused
QUALIFY rank <= {k}
"""


def mmr_topk(
    emb: DataFrame,
    n_queries: int = 5,
    k: int = 3,
    a: int = 7,
    b: int = 3,
) -> DataFrame:
    """Maximal-Marginal-Relevance DIVERSIFIED top-k (Carbonell &
    Goldstein): greedily select k results per query maximizing
    ``a·rel(q,d) − b·max_{s∈selected} sim(d,s)`` — relevance traded
    against redundancy with integer weights (a/(a+b) is the classic
    λ; default 7/3 ≈ λ=0.7). The op every retrieval stack runs when
    plain top-k returns k near-copies of the same passage.

    Exact across engines: rel and sim are the fixed-point integer
    dots, the greedy recursion is unrolled k rounds (the ``kmeans``
    induction pattern), first pick is argmax rel, every argmax ties
    by neighbor id ascending. Round-0 ``maxsim`` is 0 by convention.

    Output (query_id, neighbor_id, rel, maxsim, score, mmr_rank) —
    one row per selection, mmr_rank 1..k in pick order.

    Scale shape: the candidate relation is the broadcast tiny-query
    cross (the documented exact-baseline shape — at corpus scale the
    candidate set would be an ANN shortlist instead); each greedy
    round adds one equi-join against the ≤(round) selected rows per
    query, one partial+final max-agg, and a WindowGroupLimit rank-1
    pick. Work per round is O(|candidates|·round), never quadratic
    in the corpus.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    qn = quantized(emb)
    queries = qn.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qv")
    )
    cand = (
        qn.alias("n")
        .crossJoin(F.broadcast(queries))
        .filter(F.col("n.vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("n.vec_id").alias("neighbor_id"),
            F.col("n.q").alias("nv"),
            _dot(F.col("qv"), F.col("n.q")).alias("rel"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    sel = None  # (query_id, sel_id, sv) — grows one row/query/round
    picks = []
    for t in range(k):
        if sel is None:
            scored = cand.select(
                "query_id", "neighbor_id", "rel",
                F.lit(0).cast("long").alias("maxsim"),
            )
        else:
            avail = cand.join(
                sel.select(
                    "query_id", F.col("sel_id").alias("neighbor_id")
                ),
                ["query_id", "neighbor_id"],
                "left_anti",
            )
            scored = (
                avail.join(sel, "query_id")
                .withColumn("sim", _dot(F.col("nv"), F.col("sv")))
                .groupBy("query_id", "neighbor_id")
                .agg(
                    F.max("rel").alias("rel"),
                    F.max("sim").alias("maxsim"),
                )
            )
        pick = (
            scored.withColumn(
                "score",
                (F.lit(a).cast("long") * F.col("rel")
                 - F.lit(b).cast("long") * F.col("maxsim")).cast("long"),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "query_id", "neighbor_id", "rel", "maxsim", "score",
                F.lit(t + 1).cast("long").alias("mmr_rank"),
            )
        )
        picks.append(pick)
        new_sel = pick.join(cand, ["query_id", "neighbor_id"]).select(
            "query_id",
            F.col("neighbor_id").alias("sel_id"),
            F.col("nv").alias("sv"),
        )
        sel = new_sel if sel is None else sel.unionByName(new_sel)
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out


def mmr_topk_sql(
    n_queries: int = 5, k: int = 3, a: int = 7, b: int = 3
) -> str:
    """DuckDB twin of :func:`mmr_topk` — the greedy recursion
    unrolled into per-round CTEs (the ``kmeans`` oracle pattern)."""
    dot = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(list_zip({x}, {y}), p -> p[1] * p[2])), "
        "(a, b) -> a + b)"
    )
    parts = [f"""
WITH q AS ({QUANT_SQL}),
queries AS (
  SELECT vec_id AS query_id, q AS qv FROM q WHERE vec_id < {n_queries}
),
cand AS (
  SELECT query_id, n.vec_id AS neighbor_id, n.q AS nv,
         {dot.format(x='qv', y='n.q')} AS rel
  FROM q n CROSS JOIN queries
  WHERE n.vec_id <> query_id
),
pick0 AS (
  SELECT query_id, neighbor_id, rel, CAST(0 AS BIGINT) AS maxsim,
         CAST({a} * rel AS BIGINT) AS score, CAST(1 AS BIGINT) AS mmr_rank
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY {a} * rel DESC, neighbor_id ASC
    ) AS rn FROM cand
  ) WHERE rn = 1
),
sel0 AS (
  SELECT p.query_id, p.neighbor_id AS sel_id, c.nv AS sv
  FROM pick0 p JOIN cand c
    ON c.query_id = p.query_id AND c.neighbor_id = p.neighbor_id
)"""]
    for t in range(1, k):
        prev_sel = f"sel{t - 1}"
        parts.append(f""",
scored{t} AS (
  SELECT c.query_id, c.neighbor_id,
         max(c.rel) AS rel,
         max({dot.format(x='c.nv', y='s.sv')}) AS maxsim
  FROM cand c JOIN {prev_sel} s ON s.query_id = c.query_id
  WHERE NOT EXISTS (
    SELECT 1 FROM {prev_sel} x
    WHERE x.query_id = c.query_id AND x.sel_id = c.neighbor_id
  )
  GROUP BY 1, 2
),
pick{t} AS (
  SELECT query_id, neighbor_id, rel, maxsim,
         CAST({a} * rel - {b} * maxsim AS BIGINT) AS score,
         CAST({t + 1} AS BIGINT) AS mmr_rank
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id
      ORDER BY {a} * rel - {b} * maxsim DESC, neighbor_id ASC
    ) AS rn FROM scored{t}
  ) WHERE rn = 1
),
sel{t} AS (
  SELECT * FROM {prev_sel}
  UNION ALL
  SELECT p.query_id, p.neighbor_id, c.nv
  FROM pick{t} p JOIN cand c
    ON c.query_id = p.query_id AND c.neighbor_id = p.neighbor_id
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT query_id, neighbor_id, rel, maxsim, score, mmr_rank "
        f"FROM pick{t}" for t in range(k)
    )
    return "".join(parts) + "\n" + union


def emb_outliers(emb: DataFrame, k: int = 5) -> DataFrame:
    """Per-label embedding OUTLIERS: the k vectors furthest from their
    own label's centroid — the mislabeled / out-of-distribution
    candidate miner every embedding-curation pass runs (SemDeDup finds
    what's too close; this finds what doesn't belong).

    Exact fixed-point, no division: with per-label per-dim sums S_d
    and row count n, rank by

        n^2 * ||q - mu||^2  =  sum_d (n * q_d - S_d)^2

    in decimal(38,0) — monotone in the true distance within a label
    (n is constant per label). Ties by vec_id ascending.

    Output (label, vec_id, d2_num, rank), rank <= k.

    Scale shape: one posexplode collapsed map-side to |labels| x D
    centroid rows, re-assembled into a broadcast per-label array; the
    corpus then streams ONCE through a zip_with distance projection,
    and rank <= k plans as WindowGroupLimit per label.
    """
    from pyspark.sql import Window

    dec = "decimal(38,0)"
    q = emb.select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * QUANT).cast("long"),
        ).alias("q"),
    )
    per = (
        q.select("label", F.posexplode("q").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.sum("v").alias("s"))
    )
    cent = per.groupBy("label").agg(
        F.expr("transform(array_sort(collect_list(struct(dim, s))), "
               "x -> x.s)").alias("S")
    )
    n = q.groupBy("label").agg(F.count("*").cast("long").alias("n"))
    d2 = F.aggregate(
        F.zip_with(
            F.col("q"),
            F.col("S"),
            lambda x, s: (
                F.col("n").cast(dec) * x.cast(dec) - s.cast(dec)
            ) * (
                F.col("n").cast(dec) * x.cast(dec) - s.cast(dec)
            ),
        ),
        F.lit(0).cast(dec),
        lambda acc, v: acc + v,
    )
    scored = (
        q.join(F.broadcast(cent), "label")
        .join(F.broadcast(n), "label")
        .select("label", "vec_id", d2.cast(dec).alias("d2_num"))
    )
    w = Window.partitionBy("label").orderBy(
        F.col("d2_num").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("label").cast("long").alias("label"),
            "vec_id", "d2_num",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def emb_outliers_sql(k: int = 5, dim: int = 64) -> str:
    """DuckDB twin of :func:`emb_outliers` (constant ``dim`` per the
    fixture, the centroid-d2 oracle pattern)."""
    return f"""
WITH q AS ({quant_sql(("label",))}),
per AS (
  SELECT label, i AS dim, CAST(sum(q[i]) AS BIGINT) AS s
  FROM q CROSS JOIN generate_series(1, {dim}) AS t(i)
  GROUP BY 1, 2
),
cent AS (
  SELECT label, list(s ORDER BY dim) AS S FROM per GROUP BY 1
),
tot AS (SELECT label, CAST(count(*) AS BIGINT) AS n FROM q GROUP BY 1),
scored AS (
  SELECT q.label, q.vec_id,
         CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
                list_transform(list_zip(q.q, cent.S),
                  p -> (CAST(tot.n AS HUGEINT) * p[1] - p[2])
                       * (CAST(tot.n AS HUGEINT) * p[1] - p[2]))),
                (a, b) -> a + b) AS DECIMAL(38,0)) AS d2_num
  FROM q JOIN cent USING (label) JOIN tot USING (label)
)
SELECT CAST(label AS BIGINT) AS label, vec_id, d2_num,
       CAST(row_number() OVER (PARTITION BY label
              ORDER BY d2_num DESC, vec_id ASC) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= {k}
"""
