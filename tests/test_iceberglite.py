"""IcebergLite snapshot semantics: atomic commit, time travel,
partition overwrite, manifest pruning (SURVEY.md §7.4)."""

from __future__ import annotations

import os

import pytest

from pyreshaper_spark.sources.iceberglite import IcebergLite, SnapshotNotFound


@pytest.fixture()
def cat(tmp_path):
    return IcebergLite(str(tmp_path / "warehouse"))


def _df(spark, rows):
    return spark.createDataFrame(rows, "source string, bucket_s long, cnt long")


def test_append_and_time_travel(spark, cat):
    s1 = cat.append("t", _df(spark, [("a", 0, 1)]))
    s2 = cat.append("t", _df(spark, [("b", 60, 2)]))
    assert (s1, s2) == (1, 2)
    assert cat.current_snapshot_id("t") == 2
    assert cat.read(spark, "t").count() == 2
    old = cat.read(spark, "t", snapshot_id=1)
    assert [r["source"] for r in old.collect()] == ["a"]


def test_overwrite_replaces_everything(spark, cat):
    cat.append("t", _df(spark, [("a", 0, 1), ("b", 0, 1)]))
    cat.overwrite("t", _df(spark, [("c", 0, 9)]))
    rows = cat.read(spark, "t").collect()
    assert [r["source"] for r in rows] == ["c"]
    # previous snapshot still readable (time travel survives overwrite)
    assert cat.read(spark, "t", snapshot_id=1).count() == 2


def test_overwrite_partitions(spark, cat):
    cat.overwrite("t", _df(spark, [("a", 0, 1), ("b", 0, 2)]), ("source",))
    cat.overwrite_partitions("t", _df(spark, [("b", 0, 99)]), ("source",))
    got = {r["source"]: r["cnt"] for r in cat.read(spark, "t").collect()}
    assert got == {"a": 1, "b": 99}


def test_manifest_partition_pruning(spark, cat):
    cat.overwrite("t", _df(spark, [("a", 0, 1), ("b", 0, 2)]), ("source",))
    only_b = cat.read(spark, "t", partition_filter=lambda p: p.get("source") == "b")
    assert [r["cnt"] for r in only_b.collect()] == [2]
    assert cat.partitions("t") == {
        (("source", "a"),),
        (("source", "b"),),
    }


def test_uncommitted_data_is_invisible(spark, cat):
    """Crash between data write and log commit must not corrupt reads —
    the atomic-commit property."""
    cat.append("t", _df(spark, [("a", 0, 1)]))
    # simulate: data files land but the snapshot log never updates
    orphan = os.path.join(cat._data("t"), "s2")
    _df(spark, [("zz", 0, 123)]).write.parquet(orphan)
    assert cat.current_snapshot_id("t") == 1
    assert [r["source"] for r in cat.read(spark, "t").collect()] == ["a"]


def test_missing_snapshot_raises(spark, cat):
    cat.append("t", _df(spark, [("a", 0, 1)]))
    with pytest.raises(SnapshotNotFound):
        cat.read(spark, "t", snapshot_id=7)


def test_manifest_column_stats_file_skipping(spark, cat):
    """Unpartitioned table + stats_cols: per-file min/max in the
    manifest allow planning-time file skipping (Iceberg-style)."""
    df_a = _df(spark, [("a", 0, 1), ("a", 60, 2)]).repartition(1)
    df_b = _df(spark, [("b", 0, 3)]).repartition(1)
    cat.overwrite("t", df_a, stats_cols=("source",))
    cat.append("t", df_b, stats_cols=("source",))
    snap = cat._snapshot("t", None)
    assert all("stats" in f and "source" in f["stats"] for f in snap["files"])
    only_b = cat.read(
        spark, "t",
        stats_filter=lambda st: st["source"][0] <= "b" <= st["source"][1],
    )
    assert [r["cnt"] for r in only_b.collect()] == [3]
