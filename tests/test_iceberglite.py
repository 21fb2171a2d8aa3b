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


# --------------------------------------------------------------------------
# Maintenance: compaction + snapshot expiry
# --------------------------------------------------------------------------

def _rows(spark, cat, name, **kw):
    return {tuple(r) for r in cat.read(spark, name, **kw).collect()}


def test_compact_binpacks_and_preserves_rows(spark, cat):
    """Many small appends → one rewrite snapshot with fewer files,
    identical rows, and time travel to pre-compaction still works."""
    for i in range(5):
        cat.append(
            "t", _df(spark, [("a", 60 * i, i), ("b", 60 * i, i)]).repartition(2),
            partition_by=("source",),
        )
    before = _rows(spark, cat, "t")
    n_before = len(cat._snapshot("t", None)["files"])
    sid = cat.compact(spark, "t", partition_by=("source",))
    assert sid == 6
    snap = cat._snapshot("t", None)
    assert snap["op"] == "rewrite"
    assert len(snap["files"]) < n_before
    assert _rows(spark, cat, "t") == before
    # partition pruning still works post-compaction
    only_a = cat.read(
        spark, "t", partition_filter=lambda pt: pt.get("source") == "a"
    )
    assert {r["source"] for r in only_a.collect()} == {"a"}
    # time travel across the rewrite
    assert _rows(spark, cat, "t", snapshot_id=5) == before
    # idempotent: a second compact finds single-file partitions → no-op
    assert cat.compact(spark, "t", partition_by=("source",)) is None


def test_expire_snapshots_reclaims_dead_files(spark, cat):
    for i in range(4):
        cat.append("t", _df(spark, [("a", 60 * i, i)]))
    cat.compact(spark, "t")
    before = _rows(spark, cat, "t")
    deleted = cat.expire_snapshots("t", keep_last=1)
    assert deleted > 0
    # current snapshot unaffected
    assert _rows(spark, cat, "t") == before
    # expired snapshot ids are gone
    with pytest.raises(SnapshotNotFound):
        cat.read(spark, "t", snapshot_id=2)
    # every surviving manifest path exists on disk; dead ones are gone
    data = cat._data("t")
    live = {f["path"] for f in cat._snapshot("t", None)["files"]}
    import glob as _g

    on_disk = {
        os.path.relpath(p, data)
        for p in _g.glob(os.path.join(data, "**", "*.parquet"), recursive=True)
    }
    assert live <= on_disk and on_disk - live == set()


def test_replace_rows_copy_on_write(spark, cat):
    """Row-level delete + upsert in one commit; files that cannot match
    (per partition filter) are carried by reference."""
    cat.append(
        "t",
        _df(spark, [("a", 1, 10), ("a", 2, 20), ("b", 1, 5), ("c", 9, 1)]),
        partition_by=("source",),
    )
    before = {f["path"] for f in cat._snapshot("t", None)["files"]}
    keys = spark.createDataFrame(
        [("a", 2)], "source string, bucket_s long"
    )
    repl = _df(spark, [("a", 2, 99), ("a", 3, 7)])
    sid, rewritten, untouched = cat.replace_rows(
        spark, "t", keys, ("source", "bucket_s"), repl,
        partition_filter=lambda p: p.get("source") == "a",
        partition_by=("source",),
    )
    got = sorted(
        map(tuple, cat.read(spark, "t").select("source", "bucket_s", "cnt").collect())
    )
    assert got == [
        ("a", 1, 10), ("a", 2, 99), ("a", 3, 7), ("b", 1, 5), ("c", 9, 1)
    ]
    assert untouched == 2  # b and c files untouched
    after = {f["path"] for f in cat._snapshot("t", None)["files"]}
    assert {p for p in before if "source=b" in p or "source=c" in p} <= after
    assert not any(p in after for p in before if "source=a" in p)
    # pure delete: no replacement, drop everything matching
    allb = spark.createDataFrame([("b",)], "source string")
    cat.replace_rows(
        spark, "t", allb, ("source",), None,
        partition_filter=lambda p: p.get("source") == "b",
        partition_by=("source",),
    )
    assert cat.read(spark, "t").filter("source = 'b'").count() == 0
    # time travel across the replace still sees the original rows
    assert (
        cat.read(spark, "t", snapshot_id=1)
        .filter("source = 'a' and bucket_s = 2").collect()[0]["cnt"] == 20
    )


def test_read_changes_append_only_is_o_of_new_data(spark, cat):
    cat.append("t", _df(spark, [("a", 0, 1)]))
    cat.append("t", _df(spark, [("b", 60, 2), ("c", 120, 3)]))
    ch = cat.read_changes(spark, "t", from_snapshot_id=1)
    rows = {(r["source"], r["_change_type"]) for r in ch.collect()}
    assert rows == {("b", "insert"), ("c", "insert")}


def test_read_changes_detects_deletes_and_upserts(spark, cat):
    cat.append("t", _df(spark, [("a", 0, 1), ("b", 60, 2)]))
    keys = spark.createDataFrame([("a",)], "source string")
    cat.replace_rows(
        spark, "t", keys, ("source",),
        replacement=_df(spark, [("a", 0, 99)]),
    )
    ch = cat.read_changes(spark, "t", from_snapshot_id=1)
    got = {(r["source"], r["cnt"], r["_change_type"]) for r in ch.collect()}
    # b rode through the rewrite (carryover) → cancelled; a is del+ins
    assert got == {("a", 1, "delete"), ("a", 99, "insert")}


def test_read_changes_compaction_is_empty(spark, cat):
    cat.append("t", _df(spark, [("a", 0, 1)]))
    cat.append("t", _df(spark, [("b", 60, 2)]))
    cat.compact(spark, "t")
    ch = cat.read_changes(spark, "t", from_snapshot_id=2)
    assert ch.count() == 0
    # without carryover elimination the rewrite is visible
    raw = cat.read_changes(
        spark, "t", from_snapshot_id=2, eliminate_carryovers=False
    )
    assert raw.count() == 4


def test_read_changes_between_pinned_snapshots(spark, cat):
    cat.append("t", _df(spark, [("a", 0, 1)]))
    cat.append("t", _df(spark, [("b", 60, 2)]))
    cat.append("t", _df(spark, [("c", 120, 3)]))
    ch = cat.read_changes(spark, "t", from_snapshot_id=1, to_snapshot_id=2)
    assert {r["source"] for r in ch.collect()} == {"b"}
    same = cat.read_changes(spark, "t", from_snapshot_id=2, to_snapshot_id=2)
    assert same.count() == 0 and "_change_type" in same.columns


def test_schema_evolution_add_column_null_fills(spark, cat):
    cat.append("t", _df(spark, [("a", 0, 1)]))
    evolved = spark.createDataFrame(
        [("b", 60, 2, "fr")],
        "source string, bucket_s long, cnt long, lang string",
    )
    cat.append("t", evolved)
    got = {r["source"]: r["lang"] for r in cat.read(spark, "t").collect()}
    assert got == {"a": None, "b": "fr"}
    # time travel to the pre-evolution snapshot keeps the old schema
    assert "lang" not in cat.read(spark, "t", snapshot_id=1).columns
    ch = cat.read_changes(spark, "t", from_snapshot_id=1)
    r = ch.collect()
    assert len(r) == 1 and r[0]["lang"] == "fr"


def test_sorted_compaction_enables_stats_pruning(spark, cat):
    # unsorted appends: every file spans the whole bucket_s range, so
    # a range stats_filter cannot skip anything
    import pyspark.sql.functions as SF

    rows = [(f"s{i % 3}", (i * 37) % 1000, i) for i in range(60)]
    df = spark.createDataFrame(rows, "source string, bucket_s long, cnt long")
    for chunk in range(4):
        cat.append(
            "t",
            df.filter(SF.pmod("cnt", SF.lit(4)) == chunk).repartition(2),
            stats_cols=("bucket_s",),
        )
    pred = lambda st: st["bucket_s"][0] <= 100 and st["bucket_s"][1] >= 50
    before = cat._snapshot("t", None)["files"]
    frac_before = sum(1 for f in before if pred(f["stats"])) / len(before)

    sid = cat.compact(
        spark, "t", target_file_bytes=4096, min_files=1,
        stats_cols=("bucket_s",), sort_by=("bucket_s",),
    )
    assert sid is not None
    after = cat._snapshot("t", None)["files"]
    assert len(after) > 1
    # sorted rewrite → narrow non-overlapping ranges → the [50,100]
    # window matches a strictly smaller share of files than before
    frac_after = sum(1 for f in after if pred(f["stats"])) / len(after)
    assert frac_after < frac_before
    # the pruned read returns exactly the rows in range
    got = cat.read(spark, "t", stats_filter=pred).filter(
        (SF.col("bucket_s") >= 50) & (SF.col("bucket_s") <= 100)
    )
    want = df.filter((SF.col("bucket_s") >= 50) & (SF.col("bucket_s") <= 100))
    assert sorted(got.collect()) == sorted(want.collect())
    # lossless: full read unchanged
    assert cat.read(spark, "t").count() == 60


def test_zorder_compaction_prunes_both_dimensions(spark, cat):
    """Z-order clustering must beat a linear sort on 2-D box
    predicates: the linear layout prunes only on its leading column,
    the Morton layout prunes on both."""
    rows = [
        ("s", (i * 37) % 1000, (i * 613) % 997, i) for i in range(800)
    ]
    df = spark.createDataFrame(
        rows, "source string, x long, y long, cnt long"
    ).repartition(4)
    for t in ("lin", "zord"):
        cat.append(t, df, stats_cols=("x", "y"))

    cat.compact(
        spark, "lin", target_file_bytes=512, min_files=1,
        stats_cols=("x", "y"), sort_by=("x",),
    )
    cat.zorder_compact(
        spark, "zord", ("x", "y"), target_file_bytes=512,
        stats_cols=("x", "y"),
    )

    def overlap(st):  # 2-D box [100,300] × [700,750] — narrow in y,
        # where the x-sorted layout has NO clustering at all
        return (
            st["x"][0] <= 300 and st["x"][1] >= 100
            and st["y"][0] <= 750 and st["y"][1] >= 700
        )

    def frac(t):
        fs = cat._snapshot(t, None)["files"]
        assert len(fs) > 4, (t, len(fs))
        return sum(1 for f in fs if overlap(f["stats"])) / len(fs)

    assert frac("zord") < frac("lin")
    # pruned read is still exact
    import pyspark.sql.functions as SF

    got = cat.read(spark, "zord", stats_filter=overlap).filter(
        SF.col("x").between(100, 300) & SF.col("y").between(700, 750)
    )
    want = df.filter(
        SF.col("x").between(100, 300) & SF.col("y").between(700, 750)
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert cat.read(spark, "zord").count() == 800


def test_time_travel_by_timestamp(spark, cat):
    import time

    import pyspark.sql.functions as SF  # noqa: F401

    cat.append("t", _df(spark, [("a", 0, 1)]))
    t_mid = time.time()
    time.sleep(0.02)
    cat.append("t", _df(spark, [("b", 60, 2)]))
    sid = cat.snapshot_as_of("t", t_mid)
    assert sid == 1
    assert cat.read(spark, "t", snapshot_id=sid).count() == 1
    # a timestamp after the last commit resolves to the current snapshot
    assert cat.snapshot_as_of("t", time.time()) == 2
    with pytest.raises(SnapshotNotFound):
        cat.snapshot_as_of("t", 0.0)


def test_commit_gate_blocks_snapshot_on_raise(spark, cat):
    """The write→gate→commit split: a raising gate leaves the data
    files orphaned and the table state UNCHANGED (append and overwrite
    alike); a later successful write reuses the sid cleanly."""
    cat.append("t", _df(spark, [("a", 0, 1)]))

    def boom():
        raise RuntimeError("validation failed")

    with pytest.raises(RuntimeError, match="validation failed"):
        cat.append("t", _df(spark, [("b", 60, 2)]), gate=boom)
    with pytest.raises(RuntimeError, match="validation failed"):
        cat.overwrite("t", _df(spark, [("c", 120, 3)]), gate=boom)
    assert cat.current_snapshot_id("t") == 1
    assert [r["source"] for r in cat.read(spark, "t").collect()] == ["a"]
    # gate that passes: commit proceeds, and the retried sid's data dir
    # (written by the failed attempts) is safely overwritten
    calls = []
    sid = cat.append("t", _df(spark, [("d", 180, 4)]), gate=lambda: calls.append(1))
    assert sid == 2 and calls == [1]
    assert sorted(r["source"] for r in cat.read(spark, "t").collect()) == ["a", "d"]


def test_remove_orphan_files(spark, cat):
    """Orphan GC: files no snapshot references (aborted gated commits,
    _SUCCESS markers) are swept; live files and reads are untouched;
    the mtime grace window protects in-flight commits."""
    cat.append("t", _df(spark, [("a", 0, 1)]))

    def boom():
        raise RuntimeError("validation failed")

    with pytest.raises(RuntimeError):
        cat.append("t", _df(spark, [("b", 60, 2)]), gate=boom)
    data = cat._data("t")
    live = {
        f["path"] for s in cat._read_log("t")["snapshots"] for f in s["files"]
    }
    orphan_parts = [
        os.path.relpath(p, data)
        for p in __import__("glob").glob(
            os.path.join(data, "s2", "**", "*.parquet"), recursive=True
        )
    ]
    assert orphan_parts and not set(orphan_parts) & live

    # dry run: reports, deletes nothing
    would = cat.remove_orphan_files("t", older_than_s=0, dry_run=True)
    assert set(orphan_parts) <= set(would)
    assert all(os.path.exists(os.path.join(data, r)) for r in would)

    removed = cat.remove_orphan_files("t", older_than_s=0)
    assert set(removed) == set(would)
    assert not any(os.path.exists(os.path.join(data, r)) for r in removed)
    # live data intact, table reads unchanged
    assert all(os.path.exists(os.path.join(data, r)) for r in live)
    assert [r["source"] for r in cat.read(spark, "t").collect()] == ["a"]

    # grace window: a fresh orphan (simulated in-flight commit) survives
    with pytest.raises(RuntimeError):
        cat.append("t", _df(spark, [("c", 120, 3)]), gate=boom)
    assert cat.remove_orphan_files("t", older_than_s=3600) == []
    assert cat.remove_orphan_files("t", older_than_s=0, dry_run=True) != []

    with pytest.raises(ValueError):
        cat.remove_orphan_files("t", older_than_s=-1)


def test_write_audit_publish(spark, cat):
    """WAP: a staged snapshot is invisible to readers and to
    timestamp travel until publish; publish is also rollback."""
    import time

    s1 = cat.append("t", _df(spark, [("a", 0, 1)]))
    s2 = cat.append("t", _df(spark, [("b", 60, 2)]), stage=True)
    assert s2 == 2
    # published state unchanged; staged snapshot auditable by id
    assert cat.current_snapshot_id("t") == s1
    assert [r["source"] for r in cat.read(spark, "t").collect()] == ["a"]
    assert sorted(
        r["source"] for r in cat.read(spark, "t", snapshot_id=s2).collect()
    ) == ["a", "b"]
    # timestamp travel never sees unpublished snapshots
    assert cat.snapshot_as_of("t", time.time() + 60) == s1

    # audit passes → publish
    cat.tag("t", "audited", s2)
    assert sorted(
        r["source"] for r in cat.read(spark, "t", tag="audited").collect()
    ) == ["a", "b"]
    assert cat.publish("t", s2) == s2
    assert cat.current_snapshot_id("t") == s2
    assert sorted(r["source"] for r in cat.read(spark, "t").collect()) == [
        "a", "b",
    ]
    # published → now visible to as_of
    assert cat.snapshot_as_of("t", time.time() + 60) == s2

    # rollback = publish an older id
    cat.publish("t", s1)
    assert [r["source"] for r in cat.read(spark, "t").collect()] == ["a"]

    # sid allocation never collides with staged snapshots
    s3 = cat.append("t", _df(spark, [("c", 120, 3)]))
    assert s3 == 3
    # the append built on the PUBLISHED state (post-rollback), not the
    # staged one
    assert sorted(r["source"] for r in cat.read(spark, "t").collect()) == [
        "a", "c",
    ]


def test_expire_snapshots_older_than_composes_with_keep_last(spark, cat):
    """Iceberg's retain_last AND older_than composition: a snapshot
    younger than the age cutoff is retained even past keep_last; old
    ones beyond keep_last expire."""
    import time

    for i in range(4):
        cat.append("t", _df(spark, [("a", 60 * i, i)]))
    # back-date snapshots 1 and 2; leave 3 and 4 fresh
    log = cat._read_log("t")
    for s in log["snapshots"]:
        if s["id"] <= 2:
            s["ts"] = time.time() - 1000.0
    cat._write_log("t", log)
    # nothing older than 1h → no-op even with keep_last=1
    assert cat.expire_snapshots("t", keep_last=1, older_than_s=3600) == 0
    assert cat.read(spark, "t", snapshot_id=1).count() == 1
    # 500s cutoff: snapshots 1-2 eligible, 3 kept by age, 4 by count
    cat.expire_snapshots("t", keep_last=1, older_than_s=500)
    with pytest.raises(SnapshotNotFound):
        cat.read(spark, "t", snapshot_id=1)
    assert cat.read(spark, "t", snapshot_id=3).count() == 3
    assert cat.read(spark, "t").count() == 4
    with pytest.raises(ValueError):
        cat.expire_snapshots("t", older_than_s=-1)


def test_tags_pin_history_through_expire(spark, cat):
    cat.append("t", _df(spark, [("a", 0, 1)]))
    cat.overwrite("t", _df(spark, [("b", 60, 2)]))
    cat.overwrite("t", _df(spark, [("c", 120, 3)]))
    cat.tag("t", "v1", 1)
    assert cat.tags("t") == {"v1": 1}
    n = cat.expire_snapshots("t", keep_last=1)
    assert n >= 1
    # tagged snapshot survives expiry, untagged middle one is gone
    assert [r["source"] for r in cat.read(spark, "t", tag="v1").collect()] == ["a"]
    with pytest.raises(SnapshotNotFound):
        cat.read(spark, "t", snapshot_id=2)

    with pytest.raises(ValueError):
        cat.tag("t", "v1", 3)  # moving a tag needs replace=True
    cat.tag("t", "v1", 3, replace=True)
    assert cat.resolve_tag("t", "v1") == 3
    cat.drop_tag("t", "v1")
    with pytest.raises(SnapshotNotFound):
        cat.resolve_tag("t", "v1")
    with pytest.raises(KeyError):
        cat.drop_tag("t", "v1")
    with pytest.raises(ValueError):
        cat.read(spark, "t", snapshot_id=3, tag="x")


# -- branches: isolated multi-commit write lineages ----------------------

def test_branch_commits_stay_invisible_until_fast_forward(spark, cat):
    cat.append("t", _df(spark, [("a", 0, 1)]))
    cat.create_branch("t", "audit")
    cat.append("t", _df(spark, [("b", 60, 2)]), branch="audit")
    cat.append("t", _df(spark, [("c", 120, 3)]), branch="audit")
    # main readers still see only the published state
    assert {r["source"] for r in cat.read(spark, "t").collect()} == {"a"}
    # branch readers see the full branch lineage
    got = {r["source"] for r in cat.read(spark, "t", branch="audit").collect()}
    assert got == {"a", "b", "c"}
    # one atomic publish lands BOTH branch commits
    cat.fast_forward("t", "audit")
    got = {r["source"] for r in cat.read(spark, "t").collect()}
    assert got == {"a", "b", "c"}


def test_branch_isolated_from_main_commits(spark, cat):
    cat.append("t", _df(spark, [("a", 0, 1)]))
    cat.create_branch("t", "wip")
    cat.append("t", _df(spark, [("b", 60, 2)]), branch="wip")
    # a MAIN commit after the branch diverged
    cat.append("t", _df(spark, [("m", 0, 9)]))
    assert {r["source"] for r in cat.read(spark, "t").collect()} == {"a", "m"}
    got = {r["source"] for r in cat.read(spark, "t", branch="wip").collect()}
    assert got == {"a", "b"}  # branch did NOT pick up the main commit
    # branch parent chain records the branch lineage, not main's
    head = cat.resolve_branch("t", "wip")
    snap = cat._snapshot("t", head)
    assert snap["parent"] == 1 and snap.get("staged")


def test_abandoned_branch_drops_cleanly(spark, cat):
    cat.append("t", _df(spark, [("a", 0, 1)]))
    cat.create_branch("t", "bad")
    cat.append("t", _df(spark, [("x", 0, 7)]), branch="bad")
    cat.drop_branch("t", "bad")
    # head no longer pinned: expiry reclaims the staged branch commit
    cat.append("t", _df(spark, [("b", 60, 2)]))
    cat.expire_snapshots("t", keep_last=1)
    assert {r["source"] for r in cat.read(spark, "t").collect()} == {"a", "b"}
    import pytest as _pt

    with _pt.raises(Exception):
        cat.resolve_branch("t", "bad")


def test_branch_from_empty_table_and_head_pinned_by_expiry(spark, cat):
    cat.append("t", _df(spark, [("a", 0, 1)]))
    cat.create_branch("t", "b0")
    cat.append("t", _df(spark, [("z", 0, 5)]), branch="b0")
    for i in range(3):
        cat.append("t", _df(spark, [(f"m{i}", 0, i)]))
    cat.expire_snapshots("t", keep_last=1)
    # the branch head survived expiry (pinned like a tag)
    got = {r["source"] for r in cat.read(spark, "t", branch="b0").collect()}
    assert got == {"a", "z"}


def test_branch_cli_roundtrip(spark, cat, tmp_path):
    from jobs.maintain_job import main as maintain
    from jobs.make_config import main as mkcfg

    cat.append("t", _df(spark, [("a", 0, 1)]))
    cfg_p = str(tmp_path / "run.json")
    mkcfg([
        "--input", str(tmp_path / "unused"), "--output", cat.root,
        "--tiers", "1m:60", "-o", cfg_p,
    ])
    ck = str(tmp_path / "ck.json")
    out = maintain([
        "--config", cfg_p, "--checkpoint", ck, "create-branch",
        "--table", "t", "--name", "audit",
    ])
    assert out["snapshot_id"] == 1
    cat.append("t", _df(spark, [("b", 60, 2)]), branch="audit")
    out = maintain([
        "--config", cfg_p, "--checkpoint", ck, "fast-forward",
        "--table", "t", "--name", "audit",
    ])
    assert out["snapshot_id"] == cat.current_snapshot_id("t")
    assert {r["source"] for r in cat.read(spark, "t").collect()} == {"a", "b"}


def test_partition_spec_evolution(spark, cat):
    """Iceberg partition evolution: commits written under DIFFERENT
    partition specs coexist in one table. Each commit group reads with
    its own basePath (hive columns recovered per spec); a
    partition_filter is evolution-safe when it keeps files that cannot
    prove non-match (files from the pre-partitioned spec carry no
    key), mirroring stats_filter's keep-on-unknown contract."""
    rows1 = [("a", 0, 1), ("b", 60, 2)]
    rows2 = [("a", 120, 3), ("c", 180, 4)]
    cat.append("t", _df(spark, rows1))  # spec v1: unpartitioned
    cat.append("t", _df(spark, rows2), partition_by=("source",))  # spec v2
    got = {
        (r["source"], r["bucket_s"], r["cnt"])
        for r in cat.read(spark, "t").collect()
    }
    assert got == set(rows1) | set(rows2)
    # evolution-safe pruning: drop only files PROVEN to be other sources
    pruned = cat.read(
        spark, "t",
        partition_filter=lambda p: p.get("source") in (None, "a"),
    )
    srcs = {f["partition"].get("source")
            for f in cat._snapshot("t", None)["files"]}
    assert srcs == {None, "a", "c"}  # manifest carries both specs
    got = {(r["source"], r["cnt"]) for r in pruned.collect()}
    # spec-v2 'c' file pruned at planning time; v1 files kept (no key)
    assert got == {("a", 1), ("b", 2), ("a", 3)}


def test_fast_forward_refuses_when_main_advanced(spark, cat):
    """Review finding: publishing a branch whose base is behind main
    would silently un-publish main's intervening commits — the guard
    requires current to be an ancestor of the branch head."""
    cat.append("t", _df(spark, [("a", 0, 1)]))
    cat.create_branch("t", "audit")
    cat.append("t", _df(spark, [("b", 60, 2)]), branch="audit")
    cat.append("t", _df(spark, [("m", 0, 9)]))  # main moved on
    import pytest as _pt

    with _pt.raises(ValueError, match="not an ancestor"):
        cat.fast_forward("t", "audit")
    # main state untouched by the refused publish
    assert {r["source"] for r in cat.read(spark, "t").collect()} == {"a", "m"}


def test_expiry_pins_live_branch_intermediates(spark, cat):
    """Review finding: a live branch pins its WHOLE staged lineage —
    intermediate branch commits stay readable by id until the branch
    is dropped, as fast_forward's contract documents."""
    cat.append("t", _df(spark, [("a", 0, 1)]))
    cat.create_branch("t", "audit")
    cat.append("t", _df(spark, [("b", 60, 2)]), branch="audit")  # s2
    mid = cat.resolve_branch("t", "audit")
    cat.append("t", _df(spark, [("c", 120, 3)]), branch="audit")  # s3 head
    for i in range(3):
        cat.append("t", _df(spark, [(f"m{i}", 0, i)]))
    cat.expire_snapshots("t", keep_last=1)
    got = {r["source"] for r in cat.read(spark, "t", snapshot_id=mid).collect()}
    assert got == {"a", "b"}
    # after dropping the branch, expiry reclaims the staged lineage
    cat.drop_branch("t", "audit")
    cat.expire_snapshots("t", keep_last=1)
    with _raises_snapshot_not_found():
        cat.read(spark, "t", snapshot_id=mid)


def _raises_snapshot_not_found():
    import pytest as _pt

    return _pt.raises(SnapshotNotFound)


# -- metadata / inspection tables ------------------------------------------


def test_inspect_snapshots_and_history(spark, cat):
    s1 = cat.append("t", _df(spark, [("a", 0, 1)]))
    s2 = cat.append("t", _df(spark, [("b", 60, 2)]))
    staged = cat.append("t", _df(spark, [("c", 120, 3)]), stage=True)
    snaps = {r["snapshot_id"]: r for r in
             cat.inspect_snapshots(spark, "t").collect()}
    assert set(snaps) == {s1, s2, staged}
    assert snaps[s2]["is_current"] and not snaps[staged]["is_current"]
    assert snaps[staged]["is_staged"] and not snaps[s1]["is_staged"]
    assert snaps[s1]["parent_id"] == 0 and snaps[s2]["parent_id"] == s1
    assert snaps[s2]["n_data_files"] > snaps[s1]["n_data_files"]
    # history: published lineage only; staged snapshot absent
    hist = {r["snapshot_id"]: r for r in
            cat.inspect_history(spark, "t").collect()}
    assert set(hist) == {s1, s2}
    assert all(r["is_current_ancestor"] for r in hist.values())
    # rollback via publish: superseded commit becomes non-ancestor
    cat.publish("t", s1)
    hist2 = {r["snapshot_id"]: r["is_current_ancestor"] for r in
             cat.inspect_history(spark, "t").collect()}
    assert hist2 == {s1: True, s2: False}


def test_inspect_files_contents_and_rows(spark, cat):
    cat.append("t", _df(spark, [("a", 0, 1), ("b", 0, 2)]),
               partition_by=("source",), stats_cols=("bucket_s",))
    keys = spark.createDataFrame([("a",)], "source string")
    cat.delete_rows_mor(spark, "t", keys, ("source",))
    files = cat.inspect_files(spark, "t", with_rows=True).collect()
    data = [r for r in files if r["content"] == "data"]
    dels = [r for r in files if r["content"] == "equality-deletes"]
    assert data and dels
    assert {r["partition"]["source"] for r in data} == {"a", "b"}
    assert all(r["record_count"] == 1 for r in data)
    assert all("bucket_s" in r["stats"] for r in data)
    # delete entries carry the commit seq that gates their application
    assert all(r["seq"] == 2 for r in dels)
    # time travel: the pre-delete snapshot has no delete files
    before = cat.inspect_files(spark, "t", snapshot_id=1).collect()
    assert all(r["content"] == "data" for r in before)
    # record_count is opt-in: default leaves it NULL (no footer reads)
    lazy = cat.inspect_files(spark, "t").collect()
    assert all(r["record_count"] is None for r in lazy)


def test_inspect_refs(spark, cat):
    cat.append("t", _df(spark, [("a", 0, 1)]))
    cat.tag("t", "release-1")
    cat.create_branch("t", "audit")
    cat.append("t", _df(spark, [("b", 60, 2)]), branch="audit")
    refs = {r["ref_name"]: (r["ref_type"], r["snapshot_id"]) for r in
            cat.inspect_refs(spark, "t").collect()}
    assert refs["main"] == ("branch", 1)
    assert refs["release-1"] == ("tag", 1)
    assert refs["audit"][0] == "branch" and refs["audit"][1] > 1


def test_inspect_cli_roundtrip(spark, cat, tmp_path):
    from jobs.maintain_job import main as maintain
    from jobs.make_config import main as mkcfg

    cat.append("t", _df(spark, [("a", 0, 1)]))
    cat.tag("t", "rel")
    cfg_p = str(tmp_path / "run.json")
    mkcfg([
        "--input", str(tmp_path / "unused"), "--output", cat.root,
        "--tiers", "1m:60", "-o", cfg_p,
    ])
    ck = str(tmp_path / "ck.json")
    out = maintain([
        "--config", cfg_p, "--checkpoint", ck, "inspect",
        "--table", "t", "--what", "refs",
    ])
    got = {r["ref_name"]: r["snapshot_id"] for r in out["rows"]}
    assert got == {"main": 1, "rel": 1}
    out = maintain([
        "--config", cfg_p, "--checkpoint", ck, "inspect",
        "--table", "t", "--what", "files", "--with-rows",
    ])
    assert out["n"] >= 1
    assert all(r["record_count"] is not None for r in out["rows"])


# -- hidden partitioning (partition transforms) ------------------------------


def test_bucket_transform_roundtrip_and_pruning(spark, cat):
    """Iceberg hidden partitioning: bucket(4, doc_id) lays files out by
    a derived hash bucket that (a) never appears in the logical schema
    and (b) lets an equality predicate on doc_id prune the manifest to
    1/N of the files before any parquet opens."""
    from pyreshaper_spark.sources.iceberglite import (
        IcebergLite, _h32_py, PB_PREFIX,
    )

    df = spark.createDataFrame(
        [(f"d{i}", i) for i in range(40)], "doc_id string, v long"
    )
    cat.append("t", df, partition_by=("bucket(4,doc_id)",))
    got = cat.read(spark, "t")
    assert got.columns == ["doc_id", "v"]  # hidden col stripped
    assert {(r["doc_id"], r["v"]) for r in got.collect()} == {
        (f"d{i}", i) for i in range(40)
    }
    # manifest pruning: the filter keeps exactly one bucket's files
    snap = cat._snapshot("t", None)
    flt = IcebergLite.eq_filter(("bucket(4,doc_id)",), {"doc_id": ["d7"]})
    kept = [f for f in snap["files"] if flt(f["partition"])]
    want_bucket = str(_h32_py("d7") % 4)
    assert kept and all(
        f["partition"][f"{PB_PREFIX}doc_id_bkt4"] == want_bucket
        for f in kept
    )
    assert len(kept) < len(snap["files"])
    # the pruned read still returns the target doc
    rows = cat.read(spark, "t", partition_filter=flt).collect()
    assert "d7" in {r["doc_id"] for r in rows}


def test_truncate_transform_string_and_int(spark, cat):
    from pyreshaper_spark.sources.iceberglite import IcebergLite

    df = spark.createDataFrame(
        [("alpha", 17), ("alps", 23), ("beta", 101)],
        "name string, v long",
    )
    cat.append("t", df, partition_by=("truncate(3,name)",))
    parts = {dict(p)["_pb_name_trunc3"] for p in cat.partitions("t")}
    assert parts == {"alp", "bet"}
    flt = IcebergLite.eq_filter(("truncate(3,name)",), {"name": ["alps"]})
    got = {r["name"] for r in
           cat.read(spark, "t", partition_filter=flt).collect()}
    assert "alps" in got and "beta" not in got
    # integer truncate: floor to multiple of W
    df2 = spark.createDataFrame([(7,), (12,), (25,)], "v long")
    cat.append("u", df2, partition_by=("truncate(10,v)",))
    parts = {dict(p)["_pb_v_trunc10"] for p in cat.partitions("u")}
    assert parts == {"0", "10", "20"}


def test_transform_evolution_safe_and_reserved_prefix(spark, cat):
    """Files committed before the spec carried the transform have no
    _pb_ key and cannot prove non-match — they survive pruning; user
    columns may not use the reserved prefix."""
    from pyreshaper_spark.sources.iceberglite import IcebergLite

    cat.append("t", spark.createDataFrame([("old", 1)],
                                          "doc_id string, v long"))
    cat.append(
        "t",
        spark.createDataFrame([("new", 2)], "doc_id string, v long"),
        partition_by=("bucket(4,doc_id)",),
    )
    flt = IcebergLite.eq_filter(("bucket(4,doc_id)",), {"doc_id": ["new"]})
    got = {r["doc_id"] for r in
           cat.read(spark, "t", partition_filter=flt).collect()}
    assert got == {"old", "new"}  # pre-spec file kept (evolution-safe)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="reserved"):
        cat.append("t", spark.createDataFrame(
            [("x", 1)], "_pb_doc_id_bkt4 string, v long"))
    with _pytest.raises(ValueError, match="unsupported"):
        cat.append("t", spark.createDataFrame(
            [("x",)], "doc_id string"), partition_by=("year(doc_id)",))


def test_eq_filter_hive_escaped_and_null_values(spark, cat):
    """Spark %XX-escapes special characters in partition directory
    values (and writes __HIVE_DEFAULT_PARTITION__ for null/empty);
    eq_filter must compare through the same escaping or those files
    silently prune to nothing."""
    from pyreshaper_spark.sources.iceberglite import IcebergLite

    df = spark.createDataFrame(
        [("web/crawl", 1), ("a=b:c", 2), ("plain", 3), (None, 4)],
        "src string, v long",
    )
    cat.append("t", df, partition_by=("src",))
    for val, want_v in (("web/crawl", 1), ("a=b:c", 2), ("plain", 3)):
        flt = IcebergLite.eq_filter(("src",), {"src": [val]})
        got = {(r["src"], r["v"]) for r in
               cat.read(spark, "t", partition_filter=flt).collect()}
        assert got == {(val, want_v)}, val
    # null value lands in the hive default partition and is findable
    flt = IcebergLite.eq_filter(("src",), {"src": [None]})
    got = {r["v"] for r in
           cat.read(spark, "t", partition_filter=flt).collect()}
    assert got == {4}
    # truncate transform whose prefix contains an escaped char
    df2 = spark.createDataFrame([("a/b/c", 1), ("xyz", 2)],
                                "name string, v long")
    cat.append("u", df2, partition_by=("truncate(3,name)",))
    flt = IcebergLite.eq_filter(("truncate(3,name)",), {"name": ["a/b/c"]})
    got = {r["name"] for r in
           cat.read(spark, "u", partition_filter=flt).collect()}
    assert got == {"a/b/c"}


def test_mixture_empty_budget_rejected(spark):
    import pytest as _pytest

    from pyreshaper_spark.operators import sampling as S

    df = spark.range(1)
    for fn in (lambda: S.mix_sources(df, {}),
               lambda: S.mix_sources_sql({}),
               lambda: S.mix_token_budget(df, {}),
               lambda: S.mix_token_budget_sql({}),
               lambda: S.mix_quality_budget(df, {}, max_df=2),
               lambda: S.mix_quality_budget_sql({}, max_df=2)):
        with _pytest.raises(ValueError, match="non-empty"):
            fn()


def test_eq_filter_escape_parity_nasty_values(spark, cat):
    """One partitioned write over a battery of adversarial partition
    values; eq_filter must find every one (escape-set parity with
    Spark's directory writer, beyond the chars the unit test covers)."""
    from pyreshaper_spark.sources.iceberglite import IcebergLite

    vals = [
        "web/crawl", "a=b", "c:d", "p%q", "sp ace", "tab\tx", "nl\nx",
        "h#i", "br[ck]", "q?m", 'dq"x', "bs\\y", "st*ar", "sq'z",
        "cu{rl}", "ca^ret", "del\x7fx", "unié", "pl+us", "co,mma",
        "se;mi", "at@x", "ti~lde", "dol$lar", "%25", "__HIVE", "0",
    ]
    df = spark.createDataFrame(
        [(v, i) for i, v in enumerate(vals)], "src string, v long"
    )
    cat.append("t", df, partition_by=("src",))
    for i, v in enumerate(vals):
        flt = IcebergLite.eq_filter(("src",), {"src": [v]})
        got = {(r["src"], r["v"]) for r in
               cat.read(spark, "t", partition_filter=flt).collect()}
        assert got == {(v, i)}, repr(v)


def test_bucket_transform_composes_with_mor_delete(spark, cat):
    """Hidden partitioning + merge-on-read delete: the pruned read
    applies outstanding equality deletes, and the delete's key file
    does not disturb the transform layout."""
    from pyreshaper_spark.sources.iceberglite import IcebergLite

    df = spark.createDataFrame(
        [(f"d{i}", i) for i in range(20)], "doc_id string, v long"
    )
    cat.append("t", df, partition_by=("bucket(4,doc_id)",))
    keys = spark.createDataFrame([("d7",), ("d9",)], "doc_id string")
    cat.delete_rows_mor(spark, "t", keys, ("doc_id",))
    # full read: rows gone, hidden column still stripped
    got = cat.read(spark, "t")
    assert got.columns == ["doc_id", "v"]
    ids = {r["doc_id"] for r in got.collect()}
    assert "d7" not in ids and "d9" not in ids and len(ids) == 18
    # pruned point lookup for a SURVIVING doc in d7's bucket still
    # applies the delete
    flt = IcebergLite.eq_filter(("bucket(4,doc_id)",), {"doc_id": ["d7"]})
    pruned = {r["doc_id"] for r in
              cat.read(spark, "t", partition_filter=flt).collect()}
    assert "d7" not in pruned


def test_partition_column_type_survives_directory_roundtrip(spark, cat):
    """Hive directory recovery type-infers partition values (a string
    '7' comes back int) — reads must cast back to the commit's recorded
    schema, or numeric-string keys silently change type (and MOR
    delete anti-joins on them stop matching)."""
    df = spark.createDataFrame(
        [("7", 1), ("8", 2)], "doc_id string, v long"
    )
    cat.append("t", df, partition_by=("doc_id",))
    got = cat.read(spark, "t")
    assert dict(got.dtypes)["doc_id"] == "string"
    # MOR delete keyed on the partitioned string column still matches
    keys = spark.createDataFrame([("7",)], "doc_id string")
    cat.delete_rows_mor(spark, "t", keys, ("doc_id",))
    assert {r["doc_id"] for r in cat.read(spark, "t").collect()} == {"8"}


def test_partition_value_text_survives_directory_roundtrip(spark, cat):
    """Numeric-LOOKING string partition values must come back with
    their exact text, not the canonical rendering of an inferred
    numeric ('00' ≠ '0', '1.50' ≠ '1.5') — regression for the
    infer-then-cast-back read, which could not recover the original
    text. Fixed by reading each commit with its recorded schema."""
    df = spark.createDataFrame(
        [("00", 1), ("07", 2), ("1.50", 3)], "source string, v long"
    )
    cat.append("t", df, partition_by=("source",))
    got = cat.read(spark, "t")
    assert dict(got.dtypes)["source"] == "string"
    assert {r["source"] for r in got.collect()} == {"00", "07", "1.50"}


def test_create_table_idempotent_and_staged_interplay(spark, cat):
    """create_table commits a typed zero-file head; it is a no-op on a
    READABLE table (matching exists()), but a table holding only STAGED
    snapshots still gets its empty main head — and publishing the
    staged snapshot afterwards works unchanged."""
    df = _df(spark, [("a", 0, 1)])
    sid = cat.create_table("t", df.schema.json())
    assert sid == 1 and cat.exists("t")
    empty = cat.read(spark, "t", allow_empty=True)
    assert empty.count() == 0 and set(empty.columns) == set(df.columns)
    # idempotent: second create returns the current head, commits nothing
    assert cat.create_table("t", df.schema.json()) == sid
    assert len(cat.snapshots("t")) == 1

    # staged-only table: create still establishes the readable head
    s_staged = cat.append("t2", df, stage=True)
    assert not cat.exists("t2")
    c2 = cat.create_table("t2", df.schema.json())
    assert cat.exists("t2")
    assert cat.read(spark, "t2", allow_empty=True).count() == 0
    # the staged snapshot publishes as before and its data is intact
    cat.publish("t2", s_staged)
    assert cat.read(spark, "t2").count() == 1
    assert c2 != s_staged
