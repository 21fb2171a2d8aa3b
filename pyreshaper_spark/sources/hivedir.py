"""Hive-layout directory catalog — the second real TableCatalog binding.

A deliberately different backend from
:class:`~pyreshaper_spark.sources.iceberglite.IcebergLite`: tables are
plain hive-layout parquet directories (the shape a Hive external table
or a bare ``spark.read.parquet`` warehouse has), with ONE tiny JSON
sidecar per table holding the recorded schema, a commit counter, and
the streaming once-keys. There is no snapshot log and therefore no
time travel, CDC, refs, row mutation, or maintenance — the adapter
declares the CORE capability set only and every job that needs more
fails at binding time through
:func:`~pyreshaper_spark.sources.catalog.require_caps` with a clear
error (``tests/test_catalog_seam.py`` proves both directions: the full
batch pipeline runs green under this binding, and ``delete_docs`` /
``write_mode='append'`` refuse cleanly).

Layout::

    <root>/<table>/_table.json     sidecar {schema, version, once_keys}
    <root>/<table>/data/...        parquet files; hive partition dirs
                                   (``source=src0/part-*.parquet``)
                                   when the write is partitioned

Commit discipline: every write lands in a staging directory first and
moves into ``data/`` only after the ``gate`` callback (if any) passes,
so the pipeline's pre-commit validation barrier contract — a raising
gate leaves the table unchanged — holds here too. The move itself is a
sequence of per-file renames, not one atomic manifest swap: that is
the honest hive-layout tradeoff (same as real Hive tables without a
transactional metastore), acceptable for the single-writer jobs this
engine runs and exactly why the reference binding is IcebergLite.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import uuid
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class HiveDirCatalog:
    """Core-only :class:`TableCatalog` over plain hive directories."""

    def __init__(self, root: str):
        self.root = root

    # -- paths / sidecar --------------------------------------------------
    def _tdir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _data(self, name: str) -> str:
        return os.path.join(self._tdir(name), "data")

    def _meta_path(self, name: str) -> str:
        return os.path.join(self._tdir(name), "_table.json")

    def _read_meta(self, name: str) -> dict:
        p = self._meta_path(name)
        if not os.path.exists(p):
            return {"schema": None, "version": 0, "once_keys": []}
        with open(p) as f:
            return json.load(f)

    def _write_meta(self, name: str, meta: dict) -> None:
        os.makedirs(self._tdir(name), exist_ok=True)
        tmp = self._meta_path(name) + f".tmp{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path(name))

    # -- protocol: core ---------------------------------------------------
    def capabilities(self) -> frozenset[str]:
        return frozenset()

    def exists(self, name: str) -> bool:
        return self._read_meta(name)["version"] > 0

    def create_table(self, name: str, schema_json: str) -> int:
        meta = self._read_meta(name)
        if meta["version"] == 0:
            meta["schema"] = schema_json
            meta["version"] = 1
            os.makedirs(self._data(name), exist_ok=True)
            self._write_meta(name, meta)
        return meta["version"]

    def _reject(self, op: str, **kwargs) -> None:
        """Raise the capability error for non-default optional kwargs
        instead of silently ignoring semantics this backend lacks."""
        bad = {k: v for k, v in kwargs.items() if v}
        if bad:
            from pyreshaper_spark.sources.catalog import (
                CatalogCapabilityError,
            )

            raise CatalogCapabilityError(
                f"HiveDirCatalog.{op} does not support {sorted(bad)} "
                "(no snapshot log); bind an IcebergLite root for "
                "time-travel/staged/branch semantics"
            )

    def _write_staging(
        self,
        name: str,
        df: DataFrame,
        partition_by: tuple[str, ...],
        options: dict | None,
    ) -> str:
        # staging lives INSIDE the table dir (same filesystem — the
        # promote renames must not cross a device boundary), prefixed
        # so parquet readers of data/ never see it
        os.makedirs(self._tdir(name), exist_ok=True)
        stage = tempfile.mkdtemp(
            prefix=f"_staging_{uuid.uuid4().hex[:8]}_",
            dir=self._tdir(name),
        )
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        for k, v in (options or {}).items():
            w = w.option(k, v)
        w.parquet(stage)
        return stage

    @staticmethod
    def _part_files(stage: str) -> list[str]:
        out = []
        for dirpath, _dirs, files in os.walk(stage):
            for f in files:
                if not f.startswith(("_", ".")):
                    out.append(
                        os.path.relpath(os.path.join(dirpath, f), stage)
                    )
        return out

    @staticmethod
    def _staged_rows(stage: str, rels: list[str]) -> int:
        """Row count from the written parquet footers — driver-local,
        no Spark job (the IcebergLite empty-epoch detection idiom)."""
        import pyarrow.parquet as pq

        total = 0
        for rel in rels:
            total += pq.ParquetFile(os.path.join(stage, rel)).metadata.num_rows
            if total:
                break  # any rows at all is enough
        return total

    def _promote(self, name: str, stage: str, rels: list[str]) -> None:
        data = self._data(name)
        for rel in rels:
            dst = os.path.join(data, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.replace(os.path.join(stage, rel), dst)
        shutil.rmtree(stage, ignore_errors=True)

    def _bump(self, name: str, schema_json: str) -> int:
        meta = self._read_meta(name)
        meta["schema"] = schema_json
        meta["version"] += 1
        self._write_meta(name, meta)
        return meta["version"]

    def append(
        self,
        name: str,
        df: DataFrame,
        partition_by: tuple[str, ...] = (),
        stats_cols: tuple[str, ...] = (),
        options: dict | None = None,
        gate: Callable[[], None] | None = None,
        stage: bool = False,
        branch: str | None = None,
    ) -> int:
        self._reject("append", stage=stage, branch=branch)
        staging = self._write_staging(name, df, partition_by, options)
        if gate is not None:
            # pre-commit barrier: staging files are invisible to reads;
            # a raising gate leaves the table unchanged (staging dir is
            # leaked like IcebergLite's orphan files — swept manually)
            gate()
        self._promote(name, staging, self._part_files(staging))
        return self._bump(name, df.schema.json())

    def append_once(
        self,
        name: str,
        df: DataFrame,
        key: str,
        partition_by: tuple[str, ...] = (),
        stats_cols: tuple[str, ...] = (),
        options: dict | None = None,
    ) -> int:
        """Idempotent append keyed on ``key`` (the IcebergLite
        streaming-sink contract). Known weaker guarantee than the
        reference binding: the data promote and the key record are two
        steps, so a crash BETWEEN them lets a replayed epoch append
        twice — IcebergLite commits data+key in one atomic snapshot.
        Acceptable for the single-writer availableNow jobs this engine
        runs; bind IcebergLite where exactly-once must survive
        mid-commit crashes."""
        meta = self._read_meta(name)
        if key in meta["once_keys"]:
            return meta["version"]
        staging = self._write_staging(name, df, partition_by, options)
        rels = self._part_files(staging)
        if not self._staged_rows(staging, rels):
            # empty epoch: no rows → no commit, no key recorded (a
            # replay is vacuously idempotent)
            shutil.rmtree(staging, ignore_errors=True)
            return meta["version"]
        self._promote(name, staging, rels)
        meta = self._read_meta(name)
        meta["schema"] = df.schema.json()
        meta["version"] += 1
        meta["once_keys"].append(key)
        self._write_meta(name, meta)
        return meta["version"]

    def overwrite(
        self,
        name: str,
        df: DataFrame,
        partition_by: tuple[str, ...] = (),
        stats_cols: tuple[str, ...] = (),
        options: dict | None = None,
        gate=None,
        stage: bool = False,
    ) -> int:
        self._reject("overwrite", stage=stage)
        staging = self._write_staging(name, df, partition_by, options)
        if gate is not None:
            gate()
        data = self._data(name)
        if os.path.isdir(data):
            shutil.rmtree(data)
        os.makedirs(os.path.dirname(data), exist_ok=True)
        os.replace(staging, data)
        # drop write markers so only data files remain
        for f in os.listdir(data):
            if f.startswith(("_", ".")) and os.path.isfile(
                os.path.join(data, f)
            ):
                os.remove(os.path.join(data, f))
        return self._bump(name, df.schema.json())

    def overwrite_partitions(
        self, name: str, df: DataFrame, keys: tuple[str, ...]
    ) -> int:
        """Dynamic partition overwrite: replace exactly the hive
        partition directories present in ``df``, keep the rest."""
        if not keys:
            # no partition dirs to key the replacement on — a keyless
            # call would silently APPEND; the caller means overwrite()
            raise ValueError(
                "overwrite_partitions needs partition keys; use "
                "overwrite() to replace the whole table"
            )
        staging = self._write_staging(name, df, keys, None)
        data = self._data(name)
        # every first-level hive dir in staging replaces its twin
        replaced = set()
        rels = self._part_files(staging)
        for rel in rels:
            pdir = os.path.dirname(rel)  # e.g. source=src0[/...]
            if pdir:
                replaced.add(pdir)
        for pdir in sorted(replaced, key=len, reverse=True):
            dst = os.path.join(data, pdir)
            if os.path.isdir(dst):
                shutil.rmtree(dst)
        self._promote(name, staging, rels)
        return self._bump(name, df.schema.json())

    def read(
        self,
        spark: SparkSession,
        name: str,
        snapshot_id: int | None = None,
        partition_filter=None,
        stats_filter=None,
        allow_empty: bool = False,
        tag: str | None = None,
        apply_deletes: bool = True,
        branch: str | None = None,
    ) -> DataFrame:
        self._reject(
            "read",
            snapshot_id=snapshot_id,
            partition_filter=partition_filter,
            stats_filter=stats_filter,
            tag=tag,
            branch=branch,
        )
        meta = self._read_meta(name)
        data = self._data(name)
        has_files = any(self._part_files(data)) if os.path.isdir(data) else False
        if not has_files:
            if not allow_empty:
                raise FileNotFoundError(
                    f"hivedir table {name!r} is empty/missing"
                )
            if meta["schema"] is None:
                raise FileNotFoundError(
                    f"hivedir table {name!r} has no recorded schema"
                )
            st = StructType.fromJson(json.loads(meta["schema"]))
            return spark.createDataFrame([], st)
        df = spark.read.option("basePath", data).parquet(data)
        if meta["schema"] is not None:
            # restore recorded column order + types (hive partition
            # values come back as inferred strings at the end)
            st = StructType.fromJson(json.loads(meta["schema"]))
            cols = [
                F.col(f.name).cast(f.dataType).alias(f.name)
                for f in st.fields
                if f.name in df.columns
            ]
            extra = [c for c in df.columns if c not in st.fieldNames()]
            df = df.select(*cols, *[F.col(c) for c in extra])
        return df
