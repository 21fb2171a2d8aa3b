"""SQL surface: expose IcebergLite tables + the raw input as temp views
so users can ``spark.sql`` over the engine's outputs.

    from pyreshaper_spark.sql import register_views
    register_views(spark, cfg)
    spark.sql("SELECT * FROM tier_1h WHERE source = 'src3'").show()

Views are plain DataFrame temp views over the CURRENT snapshot of each
table; re-register after new commits (or pass ``snapshot_ids`` for
time travel).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from pyreshaper_spark.config import RunConfig
from pyreshaper_spark.sources.iceberglite import IcebergLite


def register_views(
    spark: SparkSession,
    cfg: RunConfig,
    snapshot_ids: dict[str, int] | None = None,
) -> list[str]:
    """Register a temp view per catalog table (+ ``sequences`` for the
    input). Returns the registered view names."""
    cat = IcebergLite(cfg.output_path)
    names: list[str] = []
    spark.read.parquet(cfg.input_path).createOrReplaceTempView("sequences")
    names.append("sequences")
    import os

    root = cat.root
    if os.path.isdir(root):
        for t in sorted(os.listdir(root)):
            if not cat.exists(t):
                continue
            sid = (snapshot_ids or {}).get(t)
            cat.read(spark, t, snapshot_id=sid).createOrReplaceTempView(t)
            names.append(t)
    return names
