"""Connected components over near-duplicate pairs — the dedup DECISION.

Pair generators (``dedup.verified_near_dups``, ``simhash_pairs``,
``similarity.cosine_near_dups``) emit edges; an actual dedup pass must
turn those edges into CLUSTERS and keep one canonical document per
cluster (near-dup relations are not transitive, but the industry-
standard policy — and the only one that guarantees no two kept docs
were ever flagged — is "one survivor per connected component").

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014) — each round
is one hash aggregate + one equi-join over the edge list, and the edge
count never grows, so a round is O(|E|) shuffle; the paper proves
convergence in O(log n) rounds on any graph. This is the shape that
survives 100 TB: no driver-side graph, no transitive-closure blowup,
no O(diameter) label propagation (a 1M-doc chain converges in ~20
rounds, not 1M). Hot hubs (a component's min node accumulates the
whole component as neighbors) are plain group-by skew: the per-center
``min`` is partially aggregated map-side, and the join back is
AQE-skew-split.

Driver loop: each round ends in ``localCheckpoint(eager=True)`` so the
plan does not deepen with iterations (lineage truncation — the same
discipline iterative MLlib algorithms use); convergence is detected by
an order-insensitive (count, Σ xxhash64) edge-set checksum.

Oracle: DuckDB computes the same labels with a recursive CTE
(min-reachable-node per doc), exact string match on the canonical
min-doc_id labels.

Reference parity note: the reference (an MPI slice→series transposer)
has no graph operator; this belongs to the brief's training-data
pipeline surface (dedup family, SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Canonical undirected edge set: oriented (u > v), no self-loops,
    distinct."""
    return (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every node's larger neighbors to the minimum of its
    closed neighborhood. One undirected edge in → one edge out (emitted
    from its smaller endpoint's grouping), so |E| never grows."""
    bidir = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = bidir.groupBy("u").agg(
        F.least(F.min("v"), F.col("u")).alias("m")
    )
    out = (
        bidir.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        # m <= u < v, so (v, m) is already (big, small)-oriented
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    return out.distinct()


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect every node's smaller neighbors (and itself) to the
    minimum of those neighbors. Input must be (u > v)-oriented."""
    mins = edges.groupBy("u").agg(F.min("v").alias("m"))  # m < u always
    neigh = (
        edges.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    center = mins.select(F.col("u"), F.col("m").alias("v"))
    return _canon(neigh.unionByName(center))


def _edge_checksum(edges: DataFrame) -> tuple[int, int]:
    # sum in decimal(38,0): Σ of int64 hashes overflows long under ANSI
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = 50,
) -> DataFrame:
    """Label every node reachable through ``pairs`` with its
    component's minimum node id. Returns (doc_id, component) — one row
    per distinct node, ``component == doc_id`` for the canonical root.
    """
    # node ids keep their native type: `min`/`least` must rank with the
    # same semantics the oracle's comparison uses (an int id cast to
    # string would make "107" < "8")
    edges = _canon(
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    ).localCheckpoint(eager=True)
    prev = _edge_checksum(edges)
    if prev[0] == 0:
        return edges.select(
            F.col("u").alias("doc_id"), F.col("v").alias("component")
        )
    for _ in range(max_rounds):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        cur = _edge_checksum(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint in {max_rounds} rounds"
        )
    # fixpoint is a forest of min-rooted stars: (u=member, v=root)
    members = edges.select(
        F.col("u").alias("doc_id"), F.col("v").alias("component")
    )
    roots = (
        edges.select(F.col("v").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
    )
    return members.unionByName(roots)


def components_with_size(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    components: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, component, csize) for every clustered doc — the cluster
    report a dedup audit reads. The size join is keyed on component
    (O(components) distinct keys; giant components are one group each —
    partial-agg collapses them map-side). ``components`` reuses a
    precomputed :func:`connected_components` labelling (compute the
    iterative star-contraction once, feed every audit face)."""
    cc = (
        components
        if components is not None
        else connected_components(pairs, src, dst)
    )
    sz = cc.groupBy("component").agg(F.count("*").cast("long").alias("csize"))
    return cc.join(sz, "component").select("doc_id", "component", "csize")


def survivor_flags(
    docs: DataFrame,
    pairs: DataFrame,
    components: DataFrame | None = None,
) -> DataFrame:
    """Every document flagged ``kept`` = (not clustered) or (is its
    component's canonical min). Exactly one survivor per component —
    the materialized dedup decision. Left join against the (small
    relative to the corpus) non-survivor list; at web scale broadcast
    applies when the near-dup fraction is low, else it is a plain
    hash join on doc_id."""
    cc = components if components is not None else connected_components(pairs)
    losers = cc.filter(F.col("doc_id") != F.col("component")).select(
        "doc_id", F.lit(False).alias("kept")
    )
    return (
        docs.select("doc_id", "source")
        .join(losers, "doc_id", "left")
        .withColumn("kept", F.coalesce(F.col("kept"), F.lit(True)))
    )


def dedup_survivors(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """The deduplicated corpus itself: anti-join of the non-survivor
    list (zero-copy of the kept rows — no wide shuffle of the payload
    columns; the doc payload never enters the graph computation)."""
    cc = connected_components(pairs)
    losers = cc.filter(F.col("doc_id") != F.col("component"))
    return docs.join(losers.select("doc_id"), "doc_id", "left_anti")


# --------------------------------------------------------------------------
# oracles
# --------------------------------------------------------------------------

def components_sql(pairs_sql: str) -> str:
    """DuckDB twin of :func:`components_with_size`: min-reachable-node
    labels by recursive CTE over the same pair list."""
    return f"""
WITH RECURSIVE pairs AS (
{pairs_sql}
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
nodes AS (SELECT DISTINCT u AS doc_id FROM edges),
walk(doc_id, reach) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT w.doc_id, e.v FROM walk w JOIN edges e ON e.u = w.reach
),
comp AS (SELECT doc_id, min(reach) AS component FROM walk GROUP BY 1)
SELECT c.doc_id, c.component, s.csize
FROM comp c
JOIN (SELECT component, count(*) AS csize FROM comp GROUP BY 1) s
  USING (component)
"""


def survivor_flags_sql(pairs_sql: str) -> str:
    """DuckDB twin of :func:`survivor_flags` over all documents."""
    return f"""
WITH RECURSIVE pairs AS (
{pairs_sql}
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
nodes AS (SELECT DISTINCT u AS doc_id FROM edges),
walk(doc_id, reach) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT w.doc_id, e.v FROM walk w JOIN edges e ON e.u = w.reach
),
comp AS (SELECT doc_id, min(reach) AS component FROM walk GROUP BY 1)
SELECT d.doc_id, d.source,
       coalesce(c.doc_id = c.component, TRUE) AS kept
FROM documents d LEFT JOIN comp c USING (doc_id)
"""


def dedup_rate_by_source(
    docs: DataFrame,
    pairs: DataFrame,
    components: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate RATE per source — the corpus-health dashboard's
    per-source face of :func:`survivor_flags` ("which ingestion source
    ships duplicated content?"). Exact integer counts (n_docs,
    n_dupes); the percentage is a driver-side division.

    Cost on top of the component computation: one |docs|-row left join
    (payload never shuffled — only doc_id, source ride) and an
    O(sources) aggregate."""
    return (
        survivor_flags(docs, pairs, components=components)
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("kept"), 0).otherwise(1))
            .cast("long")
            .alias("n_dupes"),
        )
    )


def dedup_rate_by_source_sql(pairs_sql: str) -> str:
    """DuckDB twin of :func:`dedup_rate_by_source`."""
    return f"""
SELECT source,
       CAST(count(*) AS BIGINT)                          AS n_docs,
       CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_dupes
FROM ({survivor_flags_sql(pairs_sql)})
GROUP BY 1
"""


def leakage_free_split(
    docs: DataFrame,
    pairs: DataFrame,
    val_bp: int = 1000,
    test_bp: int = 1000,
    components: DataFrame | None = None,
) -> DataFrame:
    """Train/val/test split with NO near-duplicate leakage across
    splits: every member of a near-dup component is assigned by the
    hash of the component's canonical representative, so a val/test
    document can never have a near-duplicate in train — the eval-set
    integrity property ``sampling.split_assign`` (doc-hash split)
    cannot give, and the reason dedup must run BEFORE splitting in a
    real training-data pipeline.

    Output (doc_id, source, group_key, split): ``group_key`` is the
    component representative (the doc itself when unclustered) and the
    split is a disjoint hash range over it — ``[0, val_bp) -> val``,
    ``[val_bp, val_bp+test_bp) -> test``, rest train, in basis points
    of the cross-engine 32-bit hash space.

    Scale shape: the component labels are the O(log n) contraction of
    :func:`connected_components`; on top of that, ONE |docs|-row left
    join on doc_id (only id + source ride — the payload never enters)
    and a stateless hash projection. Deterministic, rerun-stable, and
    partition-layout-independent like every split in ``sampling.py``.
    """
    from pyreshaper_spark.functions.xhash import h32
    from pyreshaper_spark.operators.sampling import RATE_DEN

    if val_bp + test_bp > RATE_DEN:
        raise ValueError("val_bp + test_bp must be <= 10000")
    # a caller that also runs survivor selection passes the SAME
    # component labels so the two dedup decisions cannot disagree
    # (and the contraction runs once)
    cc = components if components is not None else connected_components(pairs)
    gk = F.coalesce(F.col("component"), F.col("doc_id"))
    r = F.pmod(h32(gk.cast("string")), F.lit(RATE_DEN))
    return (
        docs.select("doc_id", "source")
        .join(cc, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            gk.cast("long").alias("group_key"),
            F.when(r < val_bp, F.lit("val"))
            .when(r < val_bp + test_bp, F.lit("test"))
            .otherwise(F.lit("train"))
            .alias("split"),
        )
    )


def leakage_free_split_sql(
    pairs_sql: str, val_bp: int = 1000, test_bp: int = 1000
) -> str:
    """DuckDB twin of :func:`leakage_free_split`."""
    from pyreshaper_spark.functions.xhash import h32_sql
    from pyreshaper_spark.operators.sampling import RATE_DEN

    rate = (
        f"(({h32_sql('CAST(coalesce(c.component, d.doc_id) AS VARCHAR)')})"
        f" % {RATE_DEN})"
    )
    return f"""
WITH RECURSIVE pairs AS (
{pairs_sql}
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
nodes AS (SELECT DISTINCT u AS doc_id FROM edges),
walk(doc_id, reach) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT w.doc_id, e.v FROM walk w JOIN edges e ON e.u = w.reach
),
comp AS (SELECT doc_id, min(reach) AS component FROM walk GROUP BY 1)
SELECT d.doc_id, d.source,
       CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS group_key,
       CASE WHEN {rate} < {val_bp} THEN 'val'
            WHEN {rate} < {val_bp + test_bp} THEN 'test'
            ELSE 'train' END AS split
FROM documents d LEFT JOIN comp c USING (doc_id)
"""


def survivor_flags_pref(
    docs: DataFrame,
    pairs: DataFrame,
    pref_col: str,
    components: DataFrame | None = None,
) -> DataFrame:
    """Quality-AWARE survivor selection: per near-dup component keep
    the member maximizing ``pref_col`` (ties by doc_id ascending) —
    the policy a real corpus wants ("keep the most complete / highest
    quality copy"), vs :func:`survivor_flags`'s arbitrary canonical
    min-id. Unclustered docs are always kept.

    Output (doc_id, source, kept) — same shape as
    :func:`survivor_flags` so downstream rate/anti-join faces compose
    unchanged.

    Scale shape: the contraction plus one CLUSTERED-rows inner join
    (bounded by the near-dup fraction) whose per-component rank ranks
    only component members — unclustered docs never enter a window
    partition (ranking them too would funnel the whole corpus into
    the NULL-component partition) — and ONE |docs| left join of the
    resulting flags.
    """
    cc = components if components is not None else connected_components(pairs)
    clustered = docs.select("doc_id", pref_col).join(cc, "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.col(pref_col).desc(), F.col("doc_id").asc()
    )
    flags = clustered.withColumn(
        "kept", F.row_number().over(w) == 1
    ).select("doc_id", "kept")
    return (
        docs.select("doc_id", "source")
        .join(flags, "doc_id", "left")
        .withColumn("kept", F.coalesce(F.col("kept"), F.lit(True)))
    )


def survivor_flags_pref_sql(pairs_sql: str, pref_expr: str) -> str:
    """DuckDB twin of :func:`survivor_flags_pref` over ``documents``."""
    return f"""
WITH RECURSIVE pairs AS (
{pairs_sql}
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
nodes AS (SELECT DISTINCT u AS doc_id FROM edges),
walk(doc_id, reach) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT w.doc_id, e.v FROM walk w JOIN edges e ON e.u = w.reach
),
comp AS (SELECT doc_id, min(reach) AS component FROM walk GROUP BY 1),
flags AS (
  SELECT doc_id, rk = 1 AS kept
  FROM (
    SELECT d.doc_id,
           row_number() OVER (
             PARTITION BY c.component
             ORDER BY {pref_expr} DESC, d.doc_id ASC
           ) AS rk
    FROM documents d JOIN comp c USING (doc_id)
  )
)
SELECT d.doc_id, d.source, coalesce(f.kept, TRUE) AS kept
FROM documents d LEFT JOIN flags f USING (doc_id)
"""
