"""ANN index lifecycle (jobs/index_job.py): persisted IVFADC tables,
partition-pruned probe ≡ the inline train+search query."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "jobs")
)

EMB = f"{SF_SMOKE}/embeddings.parquet"


def test_build_then_probe_equals_inline(spark, tmp_path):
    import index_job

    from pyreshaper_spark.operators.kmeans import ivfpq_topk

    emb = spark.read.parquet(EMB)
    root = str(tmp_path / "ann")
    m = index_job.build_index(spark, emb, root)
    assert m["n_vectors"] == emb.count()
    assert 1 <= m["n_lists"] <= m["k_coarse"]
    assert m["imbalance_ppm"] >= 1_000_000  # k·Σn²/N² ≥ 1 always
    assert set(m["snapshot_ids"]) == {
        "ann_index", "ann_codebook", "ann_centroids", "ann_manifest",
    }

    got = {
        tuple(r)
        for r in index_job.probe_index(
            spark,
            index_job._queries_from_emb(emb, 10),
            root,
            topk=5,
            nprobe=2,
        ).collect()
    }
    want = {
        tuple(r)
        for r in ivfpq_topk(emb, n_queries=10, topk=5, nprobe=2).collect()
    }
    assert got == want and got


def test_probe_read_is_partition_pruned(spark, tmp_path):
    import index_job

    from pyreshaper_spark.operators.kmeans import _probe_lists
    from pyreshaper_spark.sources.iceberglite import IcebergLite

    emb = spark.read.parquet(EMB)
    root = str(tmp_path / "ann")
    index_job.build_index(spark, emb, root)

    cat = IcebergLite(root)
    cents = cat.read(spark, "ann_centroids")
    queries = index_job._queries_from_emb(emb, 3)
    probed = {
        r["cluster"]
        for r in _probe_lists(queries, cents, 1)
        .select("cluster")
        .distinct()
        .collect()
    }
    pruned = cat.read(
        spark,
        "ann_index",
        partition_filter=lambda p: p.get("cluster") in {
            str(c) for c in probed
        },
    )
    # the pruned read contains exactly the probed lists' rows
    got_lists = {
        r["cluster"] for r in pruned.select("cluster").distinct().collect()
    }
    assert got_lists == probed
    full = cat.read(spark, "ann_index")
    assert pruned.count() < full.count()


def test_index_cli_round_trip(spark, tmp_path, capsys):
    import index_job

    root = str(tmp_path / "ann")
    built = index_job.main(["build", "--emb", EMB, "--table-root", root])
    assert built["op"] == "build" and built["n_vectors"] > 0
    res_path = str(tmp_path / "res")
    probed = index_job.main([
        "probe", "--emb", EMB, "--table-root", root,
        "--n-queries", "5", "--topk", "3", "--out", res_path,
    ])
    assert probed["op"] == "probe" and probed["n_results"] > 0
    res = spark.read.parquet(res_path)
    assert res.columns == ["query_id", "neighbor_id", "ad2", "rank"]
    # per-query top-k contract
    per_q = res.groupBy("query_id").count().agg(F.max("count")).collect()
    assert per_q[0][0] <= 3
    # a rebuild commits NEW snapshots (monotone ids, atomic swap-in)
    rebuilt = index_job.main(["build", "--emb", EMB, "--table-root", root])
    for t, sid in rebuilt["snapshot_ids"].items():
        assert sid > built["snapshot_ids"][t]
    from pyreshaper_spark.sources.iceberglite import IcebergLite

    cat = IcebergLite(root)
    assert (
        cat.current_snapshot_id("ann_index")
        == rebuilt["snapshot_ids"]["ann_index"]
    )


def test_probe_validates_params_and_handles_empty_lists(spark, tmp_path):
    import index_job
    import pytest

    from pyreshaper_spark.operators.kmeans import ivfpq_probe
    from pyreshaper_spark.sources.iceberglite import IcebergLite

    emb = spark.read.parquet(EMB)
    root = str(tmp_path / "ann")
    index_job.build_index(spark, emb, root)
    q = index_job._queries_from_emb(emb, 3)
    # probe-time params that contradict the stored build are refused
    with pytest.raises(ValueError, match="m_sub"):
        index_job.probe_index(spark, q, root, m_sub=2)
    with pytest.raises(ValueError, match="dim"):
        index_job.probe_index(spark, q, root, dim=32)
    # a fully-pruned index read (no vectors in any probed list) is a
    # typed empty relation and yields zero results, not a crash
    cat = IcebergLite(root)
    empty_index = cat.read(
        spark, "ann_index",
        partition_filter=lambda p: False, allow_empty=True,
    )
    cents = cat.read(spark, "ann_centroids")
    cb = cat.read(spark, "ann_codebook")
    assert ivfpq_probe(empty_index, cb, cents, q).count() == 0
