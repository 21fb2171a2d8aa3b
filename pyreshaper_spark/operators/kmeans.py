"""Exact-integer k-means over embeddings + IVF probe with a trained
coarse quantizer.

The hyperplane IVF in :mod:`similarity` uses data-independent buckets;
a real IVF index (FAISS ``IndexIVFFlat``) trains its inverted lists
with k-means so list populations track the data distribution. This
module is that trainer/prober, kept oracle-hashable:

* arithmetic is the fixed-point integer quantization from
  :mod:`similarity` (``round(x · 10⁴)``), so every squared distance is
  an exact int64;
* init is deterministic (centroid j = vector ``vec_id == j``);
* the centroid update is element-wise TRUNCATED integer division
  (``sum div count`` — Spark ``div`` ≡ DuckDB ``//``), i.e. centroids
  live on the same integer grid as the vectors. The ≤1-ulp-of-10⁻⁴
  perturbation vs the rational mean is far below centroid separation
  and buys bit-identical cross-engine assignments;
* ties (equidistant centroids) break toward the smaller cluster id in
  both engines.

Scale shape: each Lloyd iteration is one broadcast of k·dim integers
against a single scan (N·k candidate rows collapse in the map-side
partial agg of the argmin groupBy), then a k-row re-aggregate —
exactly the shuffle profile of the tier cascade. ``n_iter`` is a small
constant (FAISS default trains on a sample; at 100 TB you'd fit on a
``hash_sample`` of the corpus and assign the full table once, which is
the same ``assign`` operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import QUANT_SQL, _dot, quantized

DIM = 64


def _d2(a, b) -> F.Column:
    """Exact squared L2 distance between two int64 arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def init_centroids(emb: DataFrame, k: int) -> DataFrame:
    """(cid, c) — deterministic init: centroid j is vector vec_id==j."""
    return quantized(emb).filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("q").alias("c")
    )


def assign(q: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: (vec_id, q, cluster, d2).

    Broadcast the k centroids against one scan; the argmin is
    ``min(struct(d2, cid))`` — a hash aggregate with map-side partial
    collapse, no window, ties to the smaller cid.
    """
    scored = q.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "q",
        F.struct(
            _d2(F.col("q"), F.col("c")).alias("d2"),
            F.col("cid").alias("cid"),
        ).alias("cand"),
    )
    best = scored.groupBy("vec_id").agg(
        F.min("cand").alias("best"), F.first("q").alias("q")
    )
    return best.select(
        "vec_id",
        "q",
        F.col("best.cid").alias("cluster"),
        F.col("best.d2").alias("d2"),
    )


def update(assigned: DataFrame, dim: int = DIM) -> DataFrame:
    """New centroids from an assignment: element-wise ``sum div count``
    (truncated integer division — cross-engine exact). Clusters that
    lost every member disappear (both engines agree: the group simply
    has no rows)."""
    sums = assigned.groupBy(F.col("cluster").alias("cid")).agg(
        F.count("*").alias("cnt"),
        *[
            F.sum(F.element_at("q", d + 1)).alias(f"s{d}")
            for d in range(dim)
        ],
    )
    return sums.select(
        "cid",
        F.array(
            *[F.expr(f"s{d} div cnt").cast("long") for d in range(dim)]
        ).alias("c"),
    )


def lloyd(
    emb: DataFrame, k: int = 8, n_iter: int = 2, dim: int = DIM
) -> tuple[DataFrame, DataFrame]:
    """``n_iter`` Lloyd iterations; returns (assignments, centroids).
    Assignments are AFTER the last centroid update (i.e. n_iter updates
    then one final assign) — mirrored exactly by the unrolled oracle
    SQL."""
    q = quantized(emb)
    cents = init_centroids(emb, k)
    a = assign(q, cents)
    for _ in range(n_iter):
        cents = update(a, dim)
        a = assign(q, cents)
    return a, cents


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    dim: int = DIM,
    trained: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """(vec_id, cluster, d2) after ``n_iter`` Lloyd iterations.

    ``trained`` short-circuits training with a precomputed
    :func:`lloyd` result — the train-once/consume-many production
    shape (every consumer here accepts it, so one cached training
    chain feeds assignment, sampling, balance, and search)."""
    a, _ = trained if trained is not None else lloyd(emb, k, n_iter, dim)
    return a.select(
        "vec_id", F.col("cluster").cast("long").alias("cluster"), "d2"
    )


def cluster_sample(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    per_cluster: int = 5,
    dim: int = DIM,
    trained: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Cluster-balanced diversity sample — the embedding-space analog
    of stratified sampling: k-means the corpus, then keep at most
    ``per_cluster`` vectors per cluster by deterministic hash rank
    (``sample_k_per_source``'s reservoir shape, keyed on the trained
    cluster instead of the source column). This is the "take a small
    but REPRESENTATIVE subset" step of data-curation pipelines —
    a uniform sample over-draws dense regions; this caps each semantic
    region at the same budget.

    Scale shape: the Lloyd train is the module's broadcast-assign loop
    (at 100 TB you train on a ``hash_sample`` — same operator); the
    per-cluster cap is one window whose rank ≤ k predicate pushes below
    the exchange (WindowGroupLimit), so each map task forwards at most
    ``per_cluster`` rows per cluster. Output (vec_id, cluster, rk).
    """
    from pyreshaper_spark.functions.xhash import h32

    a = kmeans_assign(emb, k, n_iter, dim, trained=trained)
    w = Window.partitionBy("cluster").orderBy(
        F.pmod(h32(F.col("vec_id").cast("string")), F.lit(10_000)),
        F.col("vec_id"),
    )
    return (
        a.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= per_cluster)
        .select("vec_id", "cluster", "rk")
    )


def _probe_lists(
    queries: DataFrame, cents: DataFrame, nprobe: int
) -> DataFrame:
    """(query_id, qv, cluster): each query's ``nprobe`` nearest
    inverted lists — broadcast the centroids, rank by exact d2 (ties
    to the smaller list id). Shared by every IVF prober so nprobe /
    tie-break semantics cannot silently diverge between paths."""
    qc = queries.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "qv",
        F.col("cid").alias("cluster"),
        _d2(F.col("qv"), F.col("c")).alias("cd2"),
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("cd2").asc(), F.col("cluster").asc()
    )
    return (
        qc.withColumn("prn", F.row_number().over(wp))
        .filter(F.col("prn") <= nprobe)
        .select("query_id", "qv", "cluster")
    )


def probe_lists(
    queries: DataFrame, cents: DataFrame, nprobe: int
) -> DataFrame:
    """Public face of :func:`_probe_lists` for stored-index consumers
    (jobs/index_job.py computes the probed-list set for partition
    pruning with exactly the prober's nprobe/tie-break semantics)."""
    return _probe_lists(queries, cents, nprobe)


def query_batch(emb: DataFrame, n_queries: int) -> DataFrame:
    """The first ``n_queries`` vectors as a (query_id, qv) probe batch
    — ONE definition shared by the inline searchers and the stored-
    index CLI, so 'probe ≡ inline' can never drift on the query
    projection."""
    from pyreshaper_spark.operators.similarity import quantized

    return quantized(emb).filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qv")
    )


def ivf_kmeans_topk(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    n_queries: int = 10,
    topk: int = 5,
    nprobe: int = 2,
    dim: int = DIM,
    trained: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """IVF top-k with the trained quantizer: vectors live in their
    nearest-centroid inverted list; a query probes its ``nprobe``
    nearest lists and exact integer dot re-ranks the candidates —
    FAISS ``IndexIVFFlat.search`` shape. The probe is an equi-join on
    ``cluster`` (the list id), so a cluster-partitioned table prunes.
    Output (query_id, neighbor_id, dot, rank)."""
    lists, cents = trained if trained is not None else lloyd(
        emb, k, n_iter, dim
    )
    queries = lists.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qv")
    )
    probes = _probe_lists(queries, cents, nprobe)
    cand = (
        lists.alias("n")
        .join(F.broadcast(probes), "cluster")
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
        .filter(F.col("rank") <= topk)
        .select("query_id", "neighbor_id", "dot", "rank")
    )


# --------------------------------------------------------------------------
# oracle SQL — the Lloyd loop unrolled for a fixed n_iter
# --------------------------------------------------------------------------

_D2_SQL = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(list_zip({x}, {y}), p -> (p[1] - p[2]) * (p[1] - p[2]))), "
    "(a, b) -> a + b)"
)
_DOT_SQL = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(list_zip({x}, {y}), p -> p[1] * p[2])), (a, b) -> a + b)"
)


def _assign_cte(src: str, cents: str) -> str:
    d2 = _D2_SQL.format(x=f"{src}.q", y=f"{cents}.c")
    return f"""(
  SELECT vec_id, q, cluster, d2 FROM (
    SELECT {src}.vec_id, {src}.q, {cents}.cid AS cluster, {d2} AS d2,
           row_number() OVER (PARTITION BY {src}.vec_id
                              ORDER BY {d2} ASC, {cents}.cid ASC) AS rn
    FROM q {src} CROSS JOIN {cents}
  ) WHERE rn = 1
)"""


def _update_cte(asg: str, dim: int) -> str:
    return f"""(
  SELECT cluster AS cid, list(v ORDER BY d) AS c FROM (
    SELECT cluster, d, CAST(sum(q[d]) // count(*) AS BIGINT) AS v
    FROM {asg} CROSS JOIN (SELECT unnest(generate_series(1, {dim})) AS d)
    GROUP BY 1, 2
  ) GROUP BY 1
)"""


def _lloyd_ctes(k: int, n_iter: int, dim: int) -> str:
    """CTE chain q, c0, a0, c1, a1, … c{n_iter}, a{n_iter}; the final
    assignment CTE is ``a{n_iter}``."""
    parts = [
        f"q AS ({QUANT_SQL})",
        f"c0 AS (SELECT vec_id AS cid, q AS c FROM q WHERE vec_id < {k})",
        f"a0 AS {_assign_cte('qq', 'c0')}",
    ]
    for i in range(1, n_iter + 1):
        parts.append(f"c{i} AS {_update_cte(f'a{i - 1}', dim)}")
        parts.append(f"a{i} AS {_assign_cte('qq', f'c{i}')}")
    return ",\n".join(parts)


def kmeans_assign_sql(k: int = 8, n_iter: int = 2, dim: int = DIM) -> str:
    return f"""
WITH {_lloyd_ctes(k, n_iter, dim)}
SELECT vec_id, CAST(cluster AS BIGINT) AS cluster, d2 FROM a{n_iter}
"""


def cluster_sample_sql(
    k: int = 8, n_iter: int = 2, per_cluster: int = 5, dim: int = DIM
) -> str:
    """DuckDB twin of :func:`cluster_sample`."""
    from pyreshaper_spark.functions.xhash import h32_sql

    h = h32_sql("CAST(vec_id AS VARCHAR)")
    return f"""
WITH {_lloyd_ctes(k, n_iter, dim)}
SELECT vec_id, cluster, rk FROM (
  SELECT vec_id, CAST(cluster AS BIGINT) AS cluster,
         CAST(row_number() OVER (
             PARTITION BY cluster
             ORDER BY ({h}) % 10000, vec_id
         ) AS BIGINT) AS rk
  FROM a{n_iter}
) WHERE rk <= {per_cluster}
"""


def ivf_kmeans_topk_sql(
    k: int = 8,
    n_iter: int = 2,
    n_queries: int = 10,
    topk: int = 5,
    nprobe: int = 2,
    dim: int = DIM,
) -> str:
    cd2 = _D2_SQL.format(x="qq.qv", y="c.c")
    dot = _DOT_SQL.format(x="p.qv", y="n.q")
    return f"""
WITH {_lloyd_ctes(k, n_iter, dim)},
queries AS (SELECT vec_id AS query_id, q AS qv FROM a{n_iter}
            WHERE vec_id < {n_queries}),
probes AS (
  SELECT query_id, qv, cluster FROM (
    SELECT qq.query_id, qq.qv, c.cid AS cluster,
           row_number() OVER (PARTITION BY qq.query_id
                              ORDER BY {cd2} ASC, c.cid ASC) AS prn
    FROM queries qq CROSS JOIN c{n_iter} c
  ) WHERE prn <= {nprobe}
),
cand AS (
  SELECT p.query_id, n.vec_id AS neighbor_id, {dot} AS dot
  FROM a{n_iter} n JOIN probes p ON n.cluster = p.cluster
  WHERE n.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, dot, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY dot DESC, neighbor_id ASC) AS rank
  FROM cand)
WHERE rank <= {topk}
"""


def semdedup_pairs(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    num: int = 2,
    den: int = 5,
    dim: int = DIM,
    max_cluster: int | None = None,
    trained: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al., 2023): semantic near-dup pairs found by
    clustering first and comparing WITHIN clusters only — the recipe
    that made embedding dedup tractable on LAION/web corpora. Here the
    cluster step is the exact-integer k-means above and the comparison
    is the engine's exact cosine threshold (dot²·den² ≥ num²·|a|²·|b|²
    in decimal(38,0), no sqrt) — so unlike the paper's float pipeline,
    results are deterministic and oracle-hashable.

    Scale shape: the candidate join is an equi-join on the cluster id
    (per-cluster O(|cluster|²) pair fan-out — the SemDeDup trade: k
    controls bucket width exactly like the LSH band knobs); nothing is
    O(N²). Complements `cosine_near_dups` (banded hyperplane LSH):
    LSH bounds by random projection agreement, SemDeDup by learned
    density — on clustered data the trained quantizer wastes fewer
    comparisons.

    Output (vec_a, vec_b, cluster, dot).

    ``max_cluster`` (opt-in): drop clusters wider than the cap before
    the self-join — the same boundedness knob as the LSH paths' bucket
    cap, for corpora where k alone cannot break a dense cluster.
    """
    lists, _ = trained if trained is not None else lloyd(
        emb, k, n_iter, dim
    )
    if max_cluster is not None:
        from pyreshaper_spark.operators.similarity import _cap_buckets

        lists = _cap_buckets(lists, ["cluster"], max_cluster)
    a = lists.select(
        F.col("vec_id").alias("vec_a"), "cluster", F.col("q").alias("qa")
    )
    b = lists.select(
        F.col("vec_id").alias("vec_b"), "cluster", F.col("q").alias("qb")
    )
    n2a = _dot(F.col("qa"), F.col("qa"))
    n2b = _dot(F.col("qb"), F.col("qb"))
    d38 = "decimal(38,0)"
    pairs = (
        a.join(b, "cluster")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("dot", _dot(F.col("qa"), F.col("qb")))
        .withColumn("na2", n2a)
        .withColumn("nb2", n2b)
    )
    return pairs.filter(
        (F.col("dot") > 0)
        & (
            F.col("dot").cast(d38) * F.col("dot").cast(d38)
            * F.lit(den * den)
            >= F.col("na2").cast(d38) * F.col("nb2").cast(d38)
            * F.lit(num * num)
        )
    ).select("vec_a", "vec_b", "cluster", "dot")


def semdedup_pairs_sql(
    k: int = 8, n_iter: int = 2, num: int = 2, den: int = 5,
    dim: int = DIM,
) -> str:
    dot = _DOT_SQL.format(x="a.q", y="b.q")
    n2a = _DOT_SQL.format(x="a.q", y="a.q")
    n2b = _DOT_SQL.format(x="b.q", y="b.q")
    return f"""
WITH {_lloyd_ctes(k, n_iter, dim)}
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(a.cluster AS BIGINT) AS cluster, {dot} AS dot
FROM a{n_iter} a JOIN a{n_iter} b
  ON a.cluster = b.cluster AND a.vec_id < b.vec_id
WHERE {dot} > 0
  AND CAST({dot} AS HUGEINT) * CAST({dot} AS HUGEINT) * {den * den}
      >= CAST({n2a} AS HUGEINT) * CAST({n2b} AS HUGEINT) * {num * num}
"""


# --------------------------------------------------------------------------
# Product quantization (PQ) — the billion-scale ANN index (FAISS IndexPQ)
# --------------------------------------------------------------------------
#
# IVF above shrinks the SEARCH; PQ shrinks the VECTORS: split each
# 64-dim vector into M=4 16-dim subspaces, k-means each subspace to a
# ks=16-codeword codebook, and store each vector as M tiny codes — the
# index is M small ints per vector (vs 64 floats), which is what makes
# a 10^12-vector table fit anywhere. Search is asymmetric distance
# computation (ADC): the query's exact distance to every codeword is a
# Q×M×ks lookup table (640 ints here — broadcast), and a vector's
# approximate distance is the sum of M table lookups — never a float,
# never the original vector.
#
# Everything stays on the exact integer grid of this module: subspace
# training reuses the Lloyd machinery (truncated integer division), so
# codes, LUT entries, and ADC distances are bit-identical in DuckDB.
#
# Scale shape: training is M Lloyd loops over ONE posexploded scan per
# iteration (at 100 TB: train on a hash_sample, assign once); the
# stored index is the wide (vec_id, code_0..code_{M-1}) table; the
# probe is M broadcast equi-joins against the LUT + a per-query top-k
# window (WindowGroupLimit forwards ≤ k rows per map task) — zero
# non-broadcast shuffles against the index.

PQ_M = 4  # subspaces
PQ_KS = 16  # codewords per subspace


def _pq_explode(
    q: DataFrame, m_sub: int, sub_dim: int, carry: tuple[str, ...] = ()
) -> DataFrame:
    """(vec_id, [carry…,] m, qs): each vector split into its m_sub
    subspace slices — one projection, no join."""
    slices = F.array(
        *[F.slice("q", m * sub_dim + 1, sub_dim) for m in range(m_sub)]
    )
    return q.select(
        "vec_id", *carry, F.posexplode(slices).alias("m", "qs")
    )


def _pq_assign(
    sub: DataFrame, cb: DataFrame, carry: tuple[str, ...] = ()
) -> DataFrame:
    """Nearest codeword per (vec_id, m): broadcast the codebook, argmin
    via min(struct) — map-side partial collapse, ties to smaller cid.
    ``carry`` columns (constant per vec_id) ride through the agg."""
    scored = sub.join(F.broadcast(cb), "m").select(
        "vec_id",
        *carry,
        "m",
        "qs",
        F.struct(
            _d2(F.col("qs"), F.col("c")).alias("d2"),
            F.col("cid").alias("cid"),
        ).alias("cand"),
    )
    best = scored.groupBy("vec_id", "m").agg(
        F.min("cand").alias("best"),
        F.first("qs").alias("qs"),
        *[F.first(c).alias(c) for c in carry],
    )
    return best.select(
        "vec_id", *carry, "m", "qs", F.col("best.cid").alias("code")
    )


def _pq_update(assigned: DataFrame, sub_dim: int) -> DataFrame:
    """New codebook: element-wise ``sum div count`` per (m, code)."""
    sums = assigned.groupBy("m", F.col("code").alias("cid")).agg(
        F.count("*").alias("cnt"),
        *[
            F.sum(F.element_at("qs", d + 1)).alias(f"s{d}")
            for d in range(sub_dim)
        ],
    )
    return sums.select(
        "m",
        "cid",
        F.array(
            *[F.expr(f"s{d} div cnt").cast("long") for d in range(sub_dim)]
        ).alias("c"),
    )


def pq_train(
    emb: DataFrame,
    ks: int = PQ_KS,
    n_iter: int = 2,
    m_sub: int = PQ_M,
    dim: int = DIM,
) -> tuple[DataFrame, DataFrame]:
    """Train the PQ codebooks and encode the corpus: returns
    (codes (vec_id, m, qs, code), codebook (m, cid, c)). Init mirrors
    the coarse k-means: codeword j of every subspace is vector
    ``vec_id == j``'s slice; n_iter updates then one final assign."""
    sub = _pq_explode(quantized(emb), m_sub, dim // m_sub)
    cb = sub.filter(F.col("vec_id") < ks).select(
        "m", F.col("vec_id").alias("cid"), F.col("qs").alias("c")
    )
    a = _pq_assign(sub, cb)
    for _ in range(n_iter):
        cb = _pq_update(a, dim // m_sub)
        a = _pq_assign(sub, cb)
    return a, cb


def pq_codes(
    emb: DataFrame,
    ks: int = PQ_KS,
    n_iter: int = 2,
    m_sub: int = PQ_M,
    dim: int = DIM,
    trained: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """The stored PQ index, long face: (vec_id, m, code).

    ``trained`` short-circuits training with a precomputed
    :func:`pq_train` result (codes, codebook) — train once, consume
    from every PQ face."""
    a, _ = trained if trained is not None else pq_train(
        emb, ks, n_iter, m_sub, dim
    )
    return a.select(
        "vec_id",
        F.col("m").cast("long").alias("m"),
        F.col("code").cast("long").alias("code"),
    )


def pq_topk(
    emb: DataFrame,
    ks: int = PQ_KS,
    n_iter: int = 2,
    m_sub: int = PQ_M,
    n_queries: int = 10,
    topk: int = 5,
    dim: int = DIM,
    trained: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """ADC top-k over the PQ index: (query_id, neighbor_id, ad2, rank).

    The LUT (query × m × codeword exact d2) is broadcast; the index is
    pivoted wide (one shuffle of N·M rows at build time — the stored
    layout) and probed with M broadcast equi-joins; ad2 is the row-local
    sum of the M looked-up partial distances; top-k is a per-query rank
    window whose ``rank ≤ k`` predicate pushes below the exchange."""
    a, cb = trained if trained is not None else pq_train(
        emb, ks, n_iter, m_sub, dim
    )
    sub_dim = dim // m_sub
    wide = (
        a.groupBy("vec_id")
        .pivot("m", list(range(m_sub)))
        .agg(F.first("code"))
        .select(
            "vec_id",
            *[F.col(f"`{m}`").alias(f"code_{m}") for m in range(m_sub)],
        )
    )
    qsub = _pq_explode(
        quantized(emb).filter(F.col("vec_id") < n_queries), m_sub, sub_dim
    ).select(F.col("vec_id").alias("query_id"), "m", "qs")
    lut = qsub.join(F.broadcast(cb), "m").select(
        "query_id",
        "m",
        "cid",
        _d2(F.col("qs"), F.col("c")).alias("pd2"),
    )
    cand = wide
    ad2 = None
    for m in range(m_sub):
        lm = lut.filter(F.col("m") == m).select(
            F.col("query_id").alias(f"query_{m}"),
            F.col("cid").alias(f"cid_{m}"),
            F.col("pd2").alias(f"pd2_{m}"),
        )
        cond = F.col(f"code_{m}") == F.col(f"cid_{m}")
        if m > 0:
            cond = cond & (F.col("query_id") == F.col(f"query_{m}"))
        cand = cand.join(F.broadcast(lm), cond)
        cand = (
            cand.withColumnRenamed("query_0", "query_id")
            if m == 0
            else cand.drop(f"query_{m}")
        ).drop(f"cid_{m}")
        term = F.col(f"pd2_{m}")
        ad2 = term if ad2 is None else ad2 + term
    scored = cand.filter(F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        ad2.cast("long").alias("ad2"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("ad2").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "neighbor_id", "ad2", "rank")
    )


# ---- PQ oracle SQL --------------------------------------------------------


def _pq_ctes(
    ks: int,
    n_iter: int,
    m_sub: int,
    dim: int,
    src: str = "q",
    prefix: str = "",
    include_quant: bool = True,
) -> str:
    """CTE chain [q,] {p}sub, {p}b0, {p}p0, … {p}b{n_iter}, {p}p{n_iter}:
    the unrolled per-subspace Lloyd loop (final assignment CTE is
    ``{prefix}p{n_iter}``). ``src`` is the (vec_id, q) relation the
    subspaces slice from — the quantized corpus by default, a residual
    CTE for IVF-PQ composition (then with ``include_quant=False`` and a
    ``prefix`` so names don't collide with the coarse Lloyd chain)."""
    sub_dim = dim // m_sub
    d2 = _D2_SQL.format(x="s.qs", y="b.c")

    def assign_cte(cb: str) -> str:
        return f"""(
  SELECT vec_id, m, qs, code FROM (
    SELECT s.vec_id, s.m, s.qs, b.cid AS code,
           row_number() OVER (PARTITION BY s.vec_id, s.m
                              ORDER BY {d2} ASC, b.cid ASC) AS rn
    FROM {prefix}sub s JOIN {cb} b ON s.m = b.m
  ) WHERE rn = 1
)"""

    def update_cte(asg: str) -> str:
        return f"""(
  SELECT m, cid, list(v ORDER BY d) AS c FROM (
    SELECT m, code AS cid, d,
           CAST(sum(qs[d]) // count(*) AS BIGINT) AS v
    FROM {asg} CROSS JOIN (SELECT unnest(generate_series(1, {sub_dim})) AS d)
    GROUP BY 1, 2, 3
  ) GROUP BY 1, 2
)"""

    parts = [f"q AS ({QUANT_SQL})"] if include_quant else []
    parts += [
        f"""{prefix}sub AS (
  SELECT vec_id, m, q[(m * {sub_dim} + 1):((m + 1) * {sub_dim})] AS qs
  FROM {src} CROSS JOIN (SELECT unnest(generate_series(0, {m_sub - 1})) AS m)
)""",
        f"{prefix}b0 AS (SELECT m, vec_id AS cid, qs AS c "
        f"FROM {prefix}sub WHERE vec_id < {ks})",
        f"{prefix}p0 AS {assign_cte(f'{prefix}b0')}",
    ]
    for i in range(1, n_iter + 1):
        parts.append(f"{prefix}b{i} AS {update_cte(f'{prefix}p{i - 1}')}")
        parts.append(f"{prefix}p{i} AS {assign_cte(f'{prefix}b{i}')}")
    return ",\n".join(parts)


def pq_codes_sql(
    ks: int = PQ_KS, n_iter: int = 2, m_sub: int = PQ_M, dim: int = DIM
) -> str:
    return f"""
WITH {_pq_ctes(ks, n_iter, m_sub, dim)}
SELECT vec_id, CAST(m AS BIGINT) AS m, CAST(code AS BIGINT) AS code
FROM p{n_iter}
"""


def pq_topk_sql(
    ks: int = PQ_KS,
    n_iter: int = 2,
    m_sub: int = PQ_M,
    n_queries: int = 10,
    topk: int = 5,
    dim: int = DIM,
) -> str:
    sub_dim = dim // m_sub
    pd2 = _D2_SQL.format(x="qs.qs", y="b.c")
    return f"""
WITH {_pq_ctes(ks, n_iter, m_sub, dim)},
qsub AS (
  SELECT vec_id AS query_id, m,
         q[(m * {sub_dim} + 1):((m + 1) * {sub_dim})] AS qs
  FROM q CROSS JOIN (SELECT unnest(generate_series(0, {m_sub - 1})) AS m)
  WHERE vec_id < {n_queries}
),
lut AS (
  SELECT qs.query_id, qs.m, b.cid, {pd2} AS pd2
  FROM qsub qs JOIN b{n_iter} b ON qs.m = b.m
),
cand AS (
  SELECT l.query_id, p.vec_id AS neighbor_id,
         CAST(sum(l.pd2) AS BIGINT) AS ad2
  FROM p{n_iter} p JOIN lut l ON p.m = l.m AND p.code = l.cid
  WHERE p.vec_id <> l.query_id
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, ad2, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY ad2 ASC, neighbor_id ASC) AS rank
  FROM cand)
WHERE rank <= {topk}
"""


def pq_topk_refined(
    emb: DataFrame,
    ks: int = PQ_KS,
    n_iter: int = 2,
    m_sub: int = PQ_M,
    n_queries: int = 10,
    topk: int = 5,
    refine: int = 4,
    dim: int = DIM,
    trained: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """ADC shortlist + exact re-rank (FAISS ``IndexRefineFlat`` shape):
    PQ screens the corpus down to ``topk·refine`` candidates per query,
    then the TRUE integer squared distance re-ranks just those — the
    standard recall fix that touches original vectors only for the
    shortlist (an equi-join on vec_id bounded by Q·topk·refine rows).
    Output (query_id, neighbor_id, d2, rank) with exact d2."""
    short = pq_topk(
        emb, ks, n_iter, m_sub, n_queries, topk * refine, dim,
        trained=trained,
    )
    q = quantized(emb)
    queries = q.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qv")
    )
    nb = q.select(
        F.col("vec_id").alias("neighbor_id"), F.col("q").alias("nq")
    )
    exact = (
        nb.join(F.broadcast(short.select("query_id", "neighbor_id")),
                "neighbor_id")
        .join(F.broadcast(queries), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            _d2(F.col("qv"), F.col("nq")).alias("d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "neighbor_id", "d2", "rank")
    )


def pq_topk_refined_sql(
    ks: int = PQ_KS,
    n_iter: int = 2,
    m_sub: int = PQ_M,
    n_queries: int = 10,
    topk: int = 5,
    refine: int = 4,
    dim: int = DIM,
) -> str:
    base = pq_topk_sql(ks, n_iter, m_sub, n_queries, topk * refine, dim)
    d2 = _D2_SQL.format(x="qq.q", y="nn.q")
    return f"""
WITH short AS ({base})
SELECT query_id, neighbor_id, d2, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY d2 ASC, neighbor_id ASC) AS rank
  FROM (
    SELECT s.query_id, s.neighbor_id, {d2} AS d2
    FROM short s
    JOIN ({QUANT_SQL}) qq ON qq.vec_id = s.query_id
    JOIN ({QUANT_SQL}) nn ON nn.vec_id = s.neighbor_id
  )
)
WHERE rank <= {topk}
"""


# --------------------------------------------------------------------------
# IVF-PQ (FAISS IndexIVFPQ / IVFADC) — the billion-scale composition
# --------------------------------------------------------------------------
#
# IVF prunes the SEARCH to nprobe inverted lists; PQ shrinks the stored
# VECTORS to M codes. IVFADC composes them: each vector is stored in its
# nearest-coarse-centroid list as the PQ encoding of its RESIDUAL
# (x − centroid), and a query probes its nprobe nearest lists with a
# per-(query, list) ADC lookup table built from the query's residual
# w.r.t. that list's centroid. Residuals concentrate around zero, so
# the same codebook budget quantizes them far better than raw vectors —
# that is why this, not flat PQ, is the standard 10^9-vector index.
#
# Exactness: residuals are integer differences of the module's
# fixed-point grid, so the whole chain (coarse Lloyd → residual PQ
# train → LUT → ADC sums) stays on exact int64 and the DuckDB twin is
# hash-identical.
#
# Scale shape: the stored index is (vec_id, list_id, M codes); the
# probe plan is [index scan] ⨝broadcast [Q·nprobe·M·ks LUT] followed by
# one hash agg keyed (query_id, vec_id) whose M partial terms are
# co-located (map-side collapse) and a per-query rank window. A
# list_id-partitioned index table prunes the scan to the probed lists.


def ivfpq_train(
    emb: DataFrame,
    k_coarse: int = 8,
    ks: int = PQ_KS,
    n_iter: int = 2,
    m_sub: int = PQ_M,
    dim: int = DIM,
    coarse: tuple[DataFrame, DataFrame] | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the IVFADC index: coarse Lloyd lists + PQ codebooks over
    the residuals. Returns (index (vec_id, cluster, m, code),
    codebook (m, cid, c), centroids (cid, c)). Init mirrors the flat
    PQ (codeword j of every subspace = residual of vec_id==j);
    ``n_iter`` updates then one final assign, for both stages.
    ``coarse`` reuses a precomputed :func:`lloyd` result for the
    coarse stage."""
    lists, cents = coarse if coarse is not None else lloyd(
        emb, k_coarse, n_iter, dim
    )
    res = lists.join(
        F.broadcast(cents), lists["cluster"] == cents["cid"]
    ).select(
        "vec_id",
        "cluster",
        F.zip_with("q", "c", lambda x, y: x - y).alias("q"),
    )
    sub = _pq_explode(res, m_sub, dim // m_sub, carry=("cluster",))
    cb = sub.filter(F.col("vec_id") < ks).select(
        "m", F.col("vec_id").alias("cid"), F.col("qs").alias("c")
    )
    a = _pq_assign(sub, cb, carry=("cluster",))
    for _ in range(n_iter):
        cb = _pq_update(a, dim // m_sub)
        a = _pq_assign(sub, cb, carry=("cluster",))
    return a.select("vec_id", "cluster", "m", "code"), cb, cents


def ivfpq_topk(
    emb: DataFrame,
    k_coarse: int = 8,
    ks: int = PQ_KS,
    n_iter: int = 2,
    m_sub: int = PQ_M,
    n_queries: int = 10,
    topk: int = 5,
    nprobe: int = 2,
    dim: int = DIM,
    coarse: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """IVFADC search: (query_id, neighbor_id, ad2, rank) — ad2 is the
    exact squared L2 distance between the query's residual and the
    neighbor's RESIDUAL RECONSTRUCTION within each probed list."""
    index, cb, cents = ivfpq_train(
        emb, k_coarse, ks, n_iter, m_sub, dim, coarse=coarse
    )
    return ivfpq_probe(
        index, cb, cents, query_batch(emb, n_queries), m_sub=m_sub,
        topk=topk, nprobe=nprobe, dim=dim,
    )


def ivfpq_probe(
    index: DataFrame,
    cb: DataFrame,
    cents: DataFrame,
    queries: DataFrame,
    m_sub: int = PQ_M,
    topk: int = 5,
    nprobe: int = 2,
    dim: int = DIM,
    probes: DataFrame | None = None,
) -> DataFrame:
    """Search a STORED IVFADC index — the production read path (train
    once with :func:`ivfpq_train`, persist (index, codebook,
    centroids), probe many). ``queries`` is (query_id, qv:array<long>).

    Scale shape: the coarse probe and the LUT are query-batch-sized
    broadcasts; the only corpus-sized relation is ``index``, touched by
    ONE broadcast equi-join keyed (cluster, m, code). With the index
    table PARTITIONED BY cluster, pre-filtering it to the probed lists
    turns the scan into an O(nprobe·|query batch|)-list read — see
    jobs/index_job.py, which pushes exactly that partition filter into
    the catalog read.

    ``probes`` lets a caller that already ran :func:`probe_lists` (for
    that partition filter) pass the result in instead of paying the
    coarse assign twice.
    """
    if probes is None:
        probes = _probe_lists(queries, cents, nprobe)
    qres = probes.join(
        F.broadcast(cents), probes["cluster"] == cents["cid"]
    ).select(
        "query_id",
        "cluster",
        F.zip_with("qv", "c", lambda x, y: x - y).alias("rq"),
    )
    sub_dim = dim // m_sub
    qslices = F.array(
        *[F.slice("rq", m * sub_dim + 1, sub_dim) for m in range(m_sub)]
    )
    qsub = qres.select(
        "query_id", "cluster", F.posexplode(qslices).alias("m", "qs")
    )
    lut = qsub.join(F.broadcast(cb), "m").select(
        "query_id",
        "cluster",
        "m",
        "cid",
        _d2(F.col("qs"), F.col("c")).alias("pd2"),
    )
    cand = (
        index.join(
            F.broadcast(lut),
            (index["cluster"] == lut["cluster"])
            & (index["m"] == lut["m"])
            & (index["code"] == lut["cid"])
            & (index["vec_id"] != lut["query_id"]),
        )
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("pd2").cast("long").alias("ad2"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("ad2").asc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "neighbor_id", "ad2", "rank")
    )


def ivfpq_topk_sql(
    k_coarse: int = 8,
    ks: int = PQ_KS,
    n_iter: int = 2,
    m_sub: int = PQ_M,
    n_queries: int = 10,
    topk: int = 5,
    nprobe: int = 2,
    dim: int = DIM,
) -> str:
    """DuckDB twin of :func:`ivfpq_topk` — coarse Lloyd chain, residual
    CTE, prefixed residual-PQ chain, per-(query, probed list) LUT, ADC
    sum, rank."""
    sub_dim = dim // m_sub
    n = n_iter
    cd2 = _D2_SQL.format(x="qq.q", y="c.c")
    pd2 = _D2_SQL.format(x="s.qs", y="b.c")
    return f"""
WITH {_lloyd_ctes(k_coarse, n_iter, dim)},
res AS (
  SELECT a.vec_id, a.cluster,
         [a.q[d] - c.c[d] FOR d IN generate_series(1, {dim})] AS q
  FROM a{n} a JOIN c{n} c ON a.cluster = c.cid
),
{_pq_ctes(ks, n_iter, m_sub, dim, src="res", prefix="r",
          include_quant=False)},
probes AS (
  SELECT query_id, cluster FROM (
    SELECT qq.vec_id AS query_id, c.cid AS cluster,
           row_number() OVER (PARTITION BY qq.vec_id
                              ORDER BY {cd2} ASC, c.cid ASC) AS prn
    FROM q qq CROSS JOIN c{n} c
    WHERE qq.vec_id < {n_queries}
  ) WHERE prn <= {nprobe}
),
qres AS (
  SELECT p.query_id, p.cluster,
         [qq.q[d] - c.c[d] FOR d IN generate_series(1, {dim})] AS rq
  FROM probes p
  JOIN q qq ON qq.vec_id = p.query_id
  JOIN c{n} c ON c.cid = p.cluster
),
qsub AS (
  SELECT query_id, cluster, m,
         rq[(m * {sub_dim} + 1):((m + 1) * {sub_dim})] AS qs
  FROM qres CROSS JOIN (SELECT unnest(generate_series(0, {m_sub - 1})) AS m)
),
lut AS (
  SELECT s.query_id, s.cluster, s.m, b.cid, {pd2} AS pd2
  FROM qsub s JOIN rb{n} b ON s.m = b.m
),
cand AS (
  SELECT l.query_id, p.vec_id AS neighbor_id,
         CAST(sum(l.pd2) AS BIGINT) AS ad2
  FROM rp{n} p
  JOIN res r ON r.vec_id = p.vec_id
  JOIN lut l ON l.cluster = r.cluster AND l.m = p.m AND l.cid = p.code
  WHERE p.vec_id <> l.query_id
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, ad2, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY ad2 ASC, neighbor_id ASC) AS rank
  FROM cand)
WHERE rank <= {topk}
"""


def pq_distortion(
    emb: DataFrame,
    ks: int = PQ_KS,
    n_iter: int = 2,
    m_sub: int = PQ_M,
    dim: int = DIM,
    trained: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """PQ index-health panel: per subspace m, the exact reconstruction
    error of the trained quantizer — n vectors, Σd² and max d² between
    each sub-vector and its codeword (FAISS's imbalance/quantization-
    error diagnostics; a subspace whose distortion dwarfs the others
    means the rotation/subspace split is wrong for this corpus, and
    ADC scores from it are noise).

    Exact: d² between integer sub-vectors and integer codewords is an
    int64 sum; the per-m totals ride decimal(38,0). One broadcast of
    the (m·ks)-row codebook against the final assignment, one hash agg
    keyed m — output is m rows.
    """
    a, cb = trained if trained is not None else pq_train(
        emb, ks, n_iter, m_sub, dim
    )
    scored = a.join(
        F.broadcast(cb),
        on=[a.m == cb.m, a.code == cb.cid],
    ).select(
        a.m.alias("m"),
        _d2(F.col("qs"), F.col("c")).alias("d2"),
    )
    return (
        scored.groupBy("m")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("d2").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .alias("sum_d2"),
            F.max("d2").cast("long").alias("max_d2"),
        )
        .select(F.col("m").cast("long").alias("m"), "n", "sum_d2", "max_d2")
    )


def pq_distortion_sql(
    ks: int = PQ_KS, n_iter: int = 2, m_sub: int = PQ_M, dim: int = DIM
) -> str:
    """DuckDB twin of :func:`pq_distortion` (unrolled Lloyd chain +
    one distortion aggregate over the final assignment)."""
    d2 = _D2_SQL.format(x="p.qs", y="b.c")
    return f"""
WITH {_pq_ctes(ks, n_iter, m_sub, dim)}
SELECT CAST(p.m AS BIGINT) AS m,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum({d2}) AS DECIMAL(38,0)) AS sum_d2,
       CAST(max({d2}) AS BIGINT) AS max_d2
FROM p{n_iter} p
JOIN b{n_iter} b ON b.m = p.m AND b.cid = p.code
GROUP BY 1
"""


def ivf_balance(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    trained: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """IVF list-balance diagnostic: per trained list, its population,
    plus FAISS's imbalance factor ``k·Σn_c² / N²`` as an exact ppm
    integer on every row (1.0 = perfectly balanced lists; a high
    factor means probe cost concentrates on hot lists and nprobe
    guarantees degrade).

    One k-row aggregate over the assignment (the training chain's own
    output), then a broadcast of the 1-row total back onto k rows.
    """
    asg = kmeans_assign(emb, k=k, n_iter=n_iter, trained=trained)
    per = asg.groupBy("cluster").agg(
        F.count("*").cast("long").alias("n_c")
    )
    tot = per.agg(
        F.sum("n_c").cast("long").alias("n"),
        F.sum(F.col("n_c") * F.col("n_c")).cast("long").alias("sum_sq"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("cluster").cast("long").alias("cluster"),
            "n_c",
            "n",
            F.expr(f"sum_sq * {k} * 1000000 div (n * n)")
            .cast("long")
            .alias("imbalance_ppm"),
        )
    )


def ivf_balance_sql(k: int = 8, n_iter: int = 2, dim: int = DIM) -> str:
    """DuckDB twin of :func:`ivf_balance`."""
    return f"""
WITH {_lloyd_ctes(k, n_iter, dim)},
per AS (
  SELECT cluster, CAST(count(*) AS BIGINT) AS n_c
  FROM a{n_iter} GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n_c) AS BIGINT) AS n,
         CAST(sum(n_c * n_c) AS BIGINT) AS sum_sq
  FROM per
)
SELECT CAST(cluster AS BIGINT) AS cluster, per.n_c, tot.n,
       CAST(tot.sum_sq * {k} * 1000000 // (tot.n * tot.n) AS BIGINT)
         AS imbalance_ppm
FROM per, tot
"""
