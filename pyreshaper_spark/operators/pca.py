"""Dominant-direction (top principal component) extraction over
embeddings by power iteration, kept oracle-hashable.

The first PC of an embedding table is the workhorse of corpus
embedding health: projections along it expose encoder regressions,
dominant-topic takeover, and the axis ABTT-style post-processing
("all-but-the-top") removes before similarity search. FAISS's OPQ/PCA
pre-transforms train the same statistic.

Exactness contract (the repo's kmeans discipline — see
``operators/kmeans.py``): all arithmetic is exact integer / fixed
point, so both engines compute bit-identical results —

* vectors are the fixed-point :func:`~pyreshaper_spark.operators
  .similarity.quantized` integers;
* the iterate is re-normalized each round to max-abs = ``scale``
  (2^20) by TRUNCATED integer division ``(w·scale) div max|w|``
  (Spark ``div`` ≡ DuckDB ``//``, both toward zero), so the direction
  lives on a fixed integer grid — the ≤1-ulp truncation perturbs the
  direction far less than one power step corrects;
* no eigenvalue/data-dependent branch ever reaches a float.

Un-centered: this is the top singular direction of the raw (not
mean-subtracted) matrix — dominated by the mean for uncentered data,
which is exactly the "dominant common direction" ABTT targets. Center
upstream (subtract :func:`similarity.source_centroid` sums) when the
covariance PC is wanted.

Scale shape per iteration: one broadcast of the 64-int direction
against a scan of the (vec, dim) stream, collapsed map-side into a
per-vector dot (hash agg keyed vec_id), then a dim-keyed re-aggregate
to 64 rows — the Lloyd-iteration shuffle profile. ``n_iter`` is a
small constant; at 100 TB you'd train the direction on a
``hash_sample`` and project the full table once (the same ``project``
stage below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import QUANT_SQL, quantized

DIM = 64
SCALE = 1 << 20
DEC = "decimal(38,0)"


def pc1_direction(
    emb: DataFrame, n_iter: int = 3, dim: int = DIM, scale: int = SCALE
) -> DataFrame:
    """(dim, v): the power-iterated dominant direction at max-abs =
    ``scale`` fixed point. Exposed for testing/composition; query
    surfaces use :func:`pc1_projection`."""
    qx = quantized(emb).select(
        "vec_id", F.posexplode("q").alias("dim", "qv")
    )
    return _iterate(emb.sparkSession, qx, n_iter, dim, scale)


def pc1_projection(
    emb: DataFrame, n_iter: int = 3, dim: int = DIM, scale: int = SCALE
) -> DataFrame:
    """(vec_id, label, proj): the exact integer projection of every
    vector onto the power-iterated dominant direction (direction at
    max-abs = ``scale`` fixed point, so proj ≈ scale · ‖x‖·cosθ in
    quantized units)."""
    qx = quantized(emb).select(
        "vec_id", F.posexplode("q").alias("dim", "qv")
    )
    v = _iterate(emb.sparkSession, qx, n_iter, dim, scale)
    proj = (
        qx.join(F.broadcast(v), "dim")
        .groupBy("vec_id")
        .agg(F.sum(F.col("qv") * F.col("v")).cast("long").alias("proj"))
    )
    return (
        emb.select("vec_id", "label")
        .join(proj, "vec_id")
        .select(
            F.col("vec_id").cast("long").alias("vec_id"),
            "label",
            "proj",
        )
    )


def _iterate(spark, qx: DataFrame, n_iter: int, dim: int, scale: int):
    # v0: all-ones direction at fixed-point scale
    v = spark.range(dim).select(
        F.col("id").cast("int").alias("dim"),
        F.lit(scale).cast("long").alias("v"),
    )
    for _ in range(n_iter):
        t = (
            qx.join(F.broadcast(v), "dim")
            .groupBy("vec_id")
            .agg(F.sum(F.col("qv") * F.col("v")).cast("long").alias("t"))
        )
        w = (
            qx.join(t, "vec_id")
            .groupBy("dim")
            .agg(
                F.sum(F.col("qv").cast(DEC) * F.col("t").cast(DEC))
                .cast(DEC)
                .alias("w")
            )
        )
        m = w.agg(
            F.greatest(F.max(F.abs(F.col("w"))), F.lit(1).cast(DEC))
            .cast(DEC)
            .alias("m")
        )
        v = w.crossJoin(F.broadcast(m)).select(
            "dim",
            F.expr(f"CAST((w * {scale}) div m AS LONG)").alias("v"),
        )
    return v


def pc1_projection_sql(
    n_iter: int = 3, dim: int = DIM, scale: int = SCALE
) -> str:
    """DuckDB twin of :func:`pc1_projection`: the same induction
    UNROLLED into one CTE chain per iteration (the ``kmeans_assign``
    oracle pattern), HUGEINT where Spark holds decimal(38,0)."""
    parts = [
        f"WITH q AS ({QUANT_SQL}),",
        f"""qx AS (
  SELECT vec_id, i AS dim, q[i] AS qv
  FROM q CROSS JOIN generate_series(1, {dim}) AS g(i)
),
v0 AS (
  SELECT i AS dim, CAST({scale} AS BIGINT) AS v
  FROM generate_series(1, {dim}) AS g(i)
)""",
    ]
    for it in range(1, n_iter + 1):
        parts.append(
            f""", t{it} AS (
  SELECT qx.vec_id, CAST(sum(qx.qv * v.v) AS BIGINT) AS t
  FROM qx JOIN v{it - 1} v USING (dim) GROUP BY 1
),
w{it} AS (
  SELECT qx.dim,
         CAST(sum(CAST(qx.qv AS HUGEINT) * t.t) AS HUGEINT) AS w
  FROM qx JOIN t{it} t USING (vec_id) GROUP BY 1
),
m{it} AS (
  SELECT greatest(max(abs(w)), CAST(1 AS HUGEINT)) AS m FROM w{it}
),
v{it} AS (
  SELECT dim, CAST((w * {scale}) // m AS BIGINT) AS v
  FROM w{it}, m{it}
)"""
        )
    parts.append(
        f"""
SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
       e.label,
       p.proj
FROM embeddings e
JOIN (
  SELECT qx.vec_id, CAST(sum(qx.qv * v.v) AS BIGINT) AS proj
  FROM qx JOIN v{n_iter} v USING (dim) GROUP BY 1
) p ON p.vec_id = e.vec_id"""
    )
    return "\n".join(parts)
