"""spark-submit entry point for the ANN index lifecycle — the FAISS
``train / add / search`` flow recast as catalog tables::

    cd /root/repo && zip -qr /tmp/engine.zip pyreshaper_spark
    spark-submit --master local[32] --py-files /tmp/engine.zip \
        jobs/index_job.py build --emb sf/embeddings.parquet \
            --table-root /data/ann                 # train + persist
    ... probe --emb sf/embeddings.parquet --table-root /data/ann \
            --n-queries 10 --topk 5 --nprobe 2     # search the stored index

``build`` trains the IVFADC index (coarse Lloyd lists + product
quantizer over the residuals) and commits FOUR IcebergLite tables —
``ann_index`` (vec_id, cluster, m, code) PARTITIONED BY the coarse
list id, ``ann_codebook`` (m, cid, c), ``ann_centroids`` (cid, c),
then LAST the one-row ``ann_manifest`` pinning the trio's snapshot ids
plus the training params. The manifest makes the three-table publish
atomic AS A UNIT: probes resolve a consistent build through the
manifest head (never mixing a new index with an old codebook mid-
rebuild), past builds stay time-travelable, and probe-time parameters
come from the build itself. A build-metrics JSON line carries the
shape + the FAISS imbalance factor.

``probe`` is the production read path: centroids + codebook load from
the catalog (tiny, broadcast), the coarse probe picks each query's
nprobe lists, and the INDEX READ IS PARTITION-PRUNED to exactly those
lists — at 10^12 vectors the search touches O(nprobe · |query batch|)
list partitions of the index, never the full table. This is the point
of partitioning the index by cluster: list selection happens at
PLANNING time in the catalog (file manifest filter), not as a scan.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

INDEX_TABLE = "ann_index"
CODEBOOK_TABLE = "ann_codebook"
CENTROIDS_TABLE = "ann_centroids"
#: single-row pointer committed LAST: the pinned (index, codebook,
#: centroids) snapshot ids of one CONSISTENT build plus its training
#: params. Multi-table atomicity the Iceberg way — concurrent probes
#: resolve the trio through the manifest head, so a rebuild's partial
#: commits are never mixed across builds, and probe-time params come
#: from the build instead of caller guesses.
MANIFEST_TABLE = "ann_manifest"


def build_index(
    spark: SparkSession,
    emb: DataFrame,
    table_root: str,
    k_coarse: int = 8,
    ks: int | None = None,
    n_iter: int = 2,
    m_sub: int | None = None,
    dim: int | None = None,
) -> dict:
    from pyreshaper_spark.operators.kmeans import (
        DIM,
        PQ_KS,
        PQ_M,
        ivfpq_train,
    )

    ks = PQ_KS if ks is None else ks
    m_sub = PQ_M if m_sub is None else m_sub
    dim = DIM if dim is None else dim
    from pyreshaper_spark.sources.catalog import get_catalog

    index, cb, cents = ivfpq_train(emb, k_coarse, ks, n_iter, m_sub, dim)
    index = index.persist()
    cat = get_catalog(table_root)
    sids = {
        INDEX_TABLE: cat.overwrite(
            INDEX_TABLE,
            index.select(
                "vec_id",
                F.col("cluster").cast("long").alias("cluster"),
                F.col("m").cast("long").alias("m"),
                F.col("code").cast("long").alias("code"),
            ),
            partition_by=("cluster",),
        ),
        CODEBOOK_TABLE: cat.overwrite(CODEBOOK_TABLE, cb),
        CENTROIDS_TABLE: cat.overwrite(CENTROIDS_TABLE, cents),
    }
    # per-list population → FAISS imbalance factor k·Σn²/N² (ppm)
    rows = (
        index.filter(F.col("m") == 0)
        .groupBy("cluster")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    n_total = sum(r["n"] for r in rows)
    sum_sq = sum(r["n"] * r["n"] for r in rows)
    imb_ppm = (
        (k_coarse * sum_sq * 1_000_000) // (n_total * n_total)
        if n_total
        else None
    )
    index.unpersist()
    manifest = spark.createDataFrame(
        [(
            sids[INDEX_TABLE], sids[CODEBOOK_TABLE],
            sids[CENTROIDS_TABLE], k_coarse, ks, m_sub, dim, n_total,
        )],
        "index_sid long, codebook_sid long, centroids_sid long, "
        "k_coarse long, ks long, m_sub long, dim long, n_vectors long",
    )
    sids[MANIFEST_TABLE] = cat.overwrite(MANIFEST_TABLE, manifest)
    return {
        "op": "build",
        "n_vectors": n_total,
        "k_coarse": k_coarse,
        "ks": ks,
        "m_sub": m_sub,
        "n_lists": len(rows),
        "imbalance_ppm": imb_ppm,
        "snapshot_ids": sids,
    }


def probe_index(
    spark: SparkSession,
    queries: DataFrame,
    table_root: str,
    m_sub: int | None = None,
    topk: int = 5,
    nprobe: int = 2,
    dim: int | None = None,
) -> DataFrame:
    from pyreshaper_spark.operators.kmeans import ivfpq_probe, probe_lists
    from pyreshaper_spark.sources.catalog import get_catalog

    cat = get_catalog(table_root)
    # resolve ONE consistent build through the manifest head: pinned
    # snapshot ids + the build's own params (caller overrides are
    # validated, not trusted — probing with a different m_sub/dim than
    # the build silently corrupts distances otherwise)
    man = cat.read(spark, MANIFEST_TABLE).collect()[0]
    for pname, given in (("m_sub", m_sub), ("dim", dim)):
        if given is not None and given != man[pname]:
            raise ValueError(
                f"{pname}={given} does not match the stored build "
                f"({pname}={man[pname]} in {MANIFEST_TABLE})"
            )
    m_sub, dim = int(man["m_sub"]), int(man["dim"])
    cents = cat.read(
        spark, CENTROIDS_TABLE, snapshot_id=int(man["centroids_sid"])
    )
    cb = cat.read(
        spark, CODEBOOK_TABLE, snapshot_id=int(man["codebook_sid"])
    )
    # which lists does this query batch touch? O(nprobe · |queries|)
    # rows, collected driver-side (a probe batch is bounded by
    # construction): the cluster ids become the catalog read's
    # PARTITION filter — only those lists' files are ever opened — and
    # the rows feed ivfpq_probe directly, so the coarse assign runs
    # once, not twice
    probe_rows = probe_lists(queries, cents, nprobe).collect()
    probed = {str(r["cluster"]) for r in probe_rows}
    probes = spark.createDataFrame(
        [(r["query_id"], r["qv"], r["cluster"]) for r in probe_rows],
        "query_id long, qv array<long>, cluster long",
    )
    index = cat.read(
        spark,
        INDEX_TABLE,
        snapshot_id=int(man["index_sid"]),
        partition_filter=lambda p: p.get("cluster") in probed,
        allow_empty=True,  # all-empty probed lists → zero results
    )
    return ivfpq_probe(
        index, cb, cents, queries,
        m_sub=m_sub, topk=topk, nprobe=nprobe, dim=dim, probes=probes,
    )


def _queries_from_emb(emb: DataFrame, n_queries: int) -> DataFrame:
    from pyreshaper_spark.operators.kmeans import query_batch

    return query_batch(emb, n_queries)


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="op", required=True)

    p = sub.add_parser("build")
    p.add_argument("--emb", required=True, help="embeddings parquet")
    p.add_argument("--table-root", required=True)
    p.add_argument("--k-coarse", type=int, default=8)
    p.add_argument("--ks", type=int, default=None)
    p.add_argument("--n-iter", type=int, default=2)
    p.add_argument("--m-sub", type=int, default=None)
    p.add_argument("--dim", type=int, default=None)

    p = sub.add_parser("probe")
    p.add_argument("--emb", required=True, help="query vectors parquet")
    p.add_argument("--table-root", required=True)
    p.add_argument("--n-queries", type=int, default=10)
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--nprobe", type=int, default=2)
    p.add_argument("--m-sub", type=int, default=None)
    p.add_argument("--dim", type=int, default=None)
    p.add_argument("--out", default=None, help="result parquet path")

    args = ap.parse_args(argv)

    from pyreshaper_spark.session import get_spark

    spark = SparkSession.getActiveSession() or get_spark("index-job")
    emb = spark.read.parquet(args.emb)
    if args.op == "build":
        out = build_index(
            spark, emb, args.table_root,
            k_coarse=args.k_coarse, ks=args.ks, n_iter=args.n_iter,
            m_sub=args.m_sub, dim=args.dim,
        )
    else:
        res = probe_index(
            spark,
            _queries_from_emb(emb, args.n_queries),
            args.table_root,
            m_sub=args.m_sub, topk=args.topk, nprobe=args.nprobe,
            dim=args.dim,
        )
        if args.out:
            res.write.mode("overwrite").parquet(args.out)
            n = spark.read.parquet(args.out).count()
        else:
            n = res.count()
        out = {
            "op": "probe",
            "n_queries": args.n_queries,
            "topk": args.topk,
            "nprobe": args.nprobe,
            "n_results": n,
        }
    print("INDEX " + json.dumps(out))
    return out


if __name__ == "__main__":
    main()
