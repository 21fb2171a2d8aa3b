"""Merge-on-read equality deletes (Iceberg v2 delete-file semantics).

Copy-on-write (`replace_rows`) rewrites every candidate file to drop a
row; at 100 TB a one-document compliance delete rewrites gigabytes.
`delete_rows_mor` writes only the key set and the read path subtracts
it with a broadcast anti-join — these tests pin the semantics:

* MOR read ≡ COW read for the same key set,
* deletes apply only to data files with an OLDER sequence number
  (re-insert after delete survives),
* time travel across the delete sees the original rows,
* compaction materializes deletes and drops spent entries,
* the changelog reports MOR deletions exactly once,
* maintenance (expire / orphan GC) never sweeps a live delete file.
"""

from __future__ import annotations

import os

import pytest

from pyreshaper_spark.sources.iceberglite import IcebergLite

COLS = ["doc_id", "source", "n_tok"]


@pytest.fixture()
def cat(tmp_path):
    return IcebergLite(str(tmp_path / "wh"))


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, source string, n_tok long")


def _keys(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id string")


def _rows(df):
    return {tuple(r[c] for c in COLS) for r in df.select(*COLS).collect()}


def test_mor_equals_cow(spark, tmp_path):
    rows = [(f"d{i}", f"s{i % 3}", i) for i in range(30)]
    victims = ["d3", "d17", "d29"]
    mor, cow = IcebergLite(str(tmp_path / "mor")), IcebergLite(str(tmp_path / "cow"))
    for c in (mor, cow):
        c.append("t", _df(spark, rows))
    mor.delete_rows_mor(spark, "t", _keys(spark, victims), ("doc_id",))
    cow.replace_rows(spark, "t", _keys(spark, victims), ("doc_id",))
    got, want = _rows(mor.read(spark, "t")), _rows(cow.read(spark, "t"))
    assert got == want
    assert len(got) == 27


def test_mor_is_metadata_only_and_time_travels(spark, cat):
    s1 = cat.append("t", _df(spark, [("a", "s0", 1), ("b", "s0", 2)]))
    before = {f["path"] for f in cat._snapshot("t", None)["files"]}
    s2 = cat.delete_rows_mor(spark, "t", _keys(spark, ["a"]), ("doc_id",))
    snap = cat._snapshot("t", None)
    # data files untouched — the delete is a manifest + key-file commit
    assert {f["path"] for f in snap["files"]} == before
    assert [d["seq"] for d in snap["deletes"]] == [s2]
    assert _rows(cat.read(spark, "t")) == {("b", "s0", 2)}
    # time travel to the pre-delete snapshot sees the original rows
    assert _rows(cat.read(spark, "t", snapshot_id=s1)) == {
        ("a", "s0", 1),
        ("b", "s0", 2),
    }
    # raw view (merge-on-read debugging) skips the anti-join
    assert cat.read(spark, "t", apply_deletes=False).count() == 2


def test_reinsert_after_delete_survives(spark, cat):
    cat.append("t", _df(spark, [("a", "s0", 1), ("b", "s0", 2)]))
    cat.delete_rows_mor(spark, "t", _keys(spark, ["a"]), ("doc_id",))
    # same key re-appended AFTER the delete: newer sequence → survives
    cat.append("t", _df(spark, [("a", "s0", 99)]))
    assert _rows(cat.read(spark, "t")) == {("a", "s0", 99), ("b", "s0", 2)}
    # a delete committed after that removes the new row too
    cat.delete_rows_mor(spark, "t", _keys(spark, ["a"]), ("doc_id",))
    assert _rows(cat.read(spark, "t")) == {("b", "s0", 2)}


def test_compaction_materializes_and_drops_deletes(spark, cat):
    cat.append("t", _df(spark, [("a", "s0", 1), ("b", "s1", 2)]))
    cat.append("t", _df(spark, [("c", "s0", 3), ("d", "s1", 4)]))
    cat.delete_rows_mor(spark, "t", _keys(spark, ["b", "c"]), ("doc_id",))
    want = {("a", "s0", 1), ("d", "s1", 4)}
    assert _rows(cat.read(spark, "t")) == want
    cat.compact(spark, "t", min_files=1)
    snap = cat._snapshot("t", None)
    # full rewrite: no remaining file predates the delete → entry dropped
    assert "deletes" not in snap or not snap["deletes"]
    assert _rows(cat.read(spark, "t")) == want
    # raw read now equals the merged read (delete was materialized)
    assert _rows(cat.read(spark, "t", apply_deletes=False)) == want


def test_cow_rewrite_does_not_resurrect_mor_deleted_rows(spark, cat):
    cat.append("t", _df(spark, [("a", "s0", 1), ("b", "s0", 2), ("c", "s0", 3)]))
    cat.delete_rows_mor(spark, "t", _keys(spark, ["a"]), ("doc_id",))
    # COW-delete another key: the rewrite must apply the MOR delete too
    cat.replace_rows(spark, "t", _keys(spark, ["b"]), ("doc_id",))
    assert _rows(cat.read(spark, "t")) == {("c", "s0", 3)}
    assert _rows(cat.read(spark, "t", apply_deletes=False)) == {("c", "s0", 3)}


def test_changelog_reports_mor_delete_once(spark, cat):
    s1 = cat.append("t", _df(spark, [("a", "s0", 1), ("b", "s0", 2)]))
    cat.delete_rows_mor(spark, "t", _keys(spark, ["a"]), ("doc_id",))
    ch = cat.read_changes(spark, "t", from_snapshot_id=s1).collect()
    assert [(r["doc_id"], r["_change_type"]) for r in ch] == [("a", "delete")]
    # delete + compaction in one range: still exactly one net delete
    s3 = cat.current_snapshot_id("t")
    cat.delete_rows_mor(spark, "t", _keys(spark, ["b"]), ("doc_id",))
    cat.compact(spark, "t", min_files=1)
    ch2 = cat.read_changes(spark, "t", from_snapshot_id=s3).collect()
    assert [(r["doc_id"], r["_change_type"]) for r in ch2] == [("b", "delete")]
    # whole history: both deletions, each once, no inserts re-reported
    ch3 = cat.read_changes(spark, "t", from_snapshot_id=s1)
    got = sorted((r["doc_id"], r["_change_type"]) for r in ch3.collect())
    assert got == [("a", "delete"), ("b", "delete")]


def test_changelog_delete_covers_file_added_in_range(spark, cat):
    s1 = cat.append("t", _df(spark, [("a", "s0", 1)]))
    cat.append("t", _df(spark, [("b", "s0", 2)]))  # added in range
    cat.delete_rows_mor(spark, "t", _keys(spark, ["b"]), ("doc_id",))
    ch = cat.read_changes(spark, "t", from_snapshot_id=s1).collect()
    # b was inserted AND deleted within the range → nets to nothing
    assert ch == []


def test_already_deleted_key_does_not_reemit(spark, cat):
    cat.append("t", _df(spark, [("a", "s0", 1), ("b", "s0", 2)]))
    cat.delete_rows_mor(spark, "t", _keys(spark, ["a"]), ("doc_id",))
    mid = cat.current_snapshot_id("t")
    # second delete overlaps the first — 'a' is already gone at `mid`
    cat.delete_rows_mor(spark, "t", _keys(spark, ["a", "b"]), ("doc_id",))
    ch = cat.read_changes(spark, "t", from_snapshot_id=mid).collect()
    assert [(r["doc_id"], r["_change_type"]) for r in ch] == [("b", "delete")]


def test_maintenance_keeps_live_delete_files(spark, cat):
    cat.append("t", _df(spark, [("a", "s0", 1), ("b", "s0", 2)]))
    cat.append("t", _df(spark, [("c", "s0", 3)]))
    cat.delete_rows_mor(spark, "t", _keys(spark, ["a"]), ("doc_id",))
    # orphan GC (no grace window) must not sweep the live delete file
    # (_SUCCESS markers are untracked by design and legitimately swept)
    removed = cat.remove_orphan_files("t", older_than_s=0)
    assert [p for p in removed if p.endswith(".parquet")] == []
    # expiring history keeps the delete file (current snapshot needs it)
    cat.expire_snapshots("t", keep_last=1)
    assert _rows(cat.read(spark, "t")) == {("b", "s0", 2), ("c", "s0", 3)}
    data = cat._data("t")
    snap = cat._snapshot("t", None)
    for d in snap["deletes"]:
        for p in d["paths"]:
            assert os.path.exists(os.path.join(data, p))
    # once compaction materializes the delete, expiry reclaims its file
    cat.compact(spark, "t", min_files=1)
    cat.expire_snapshots("t", keep_last=1)
    leftover = [
        p
        for p in __import__("glob").glob(os.path.join(data, "d*", "*"))
    ]
    assert leftover == []


def test_mor_delete_cli(spark, tmp_path):
    """The maintain CLI's mor-delete subcommand: string key values are
    cast to the table column's recorded type before the delete."""
    from jobs.maintain_job import main as maintain
    from jobs.make_config import main as mkcfg

    cat = IcebergLite(str(tmp_path / "out"))
    # a table with a NON-string key type exercises the schema cast
    df = spark.createDataFrame(
        [(i, f"s{i % 2}", i * 10) for i in range(8)],
        "doc_id long, source string, n_tok long",
    )
    cat.append("docs", df)
    cfg_p = str(tmp_path / "run.json")
    mkcfg([
        "--input", str(tmp_path / "unused"), "--output", str(tmp_path / "out"),
        "--tiers", "1m:60", "-o", cfg_p,
    ])
    out = maintain([
        "--config", cfg_p, "--checkpoint", str(tmp_path / "ck.json"),
        "mor-delete", "--table", "docs", "--doc-ids", "3", "5",
    ])
    assert out["snapshot_id"] == 2
    left = {r["doc_id"] for r in cat.read(spark, "docs").collect()}
    assert left == {0, 1, 2, 4, 6, 7}


def test_mor_read_plans_broadcast_anti_join(spark, cat):
    cat.append("t", _df(spark, [(f"d{i}", "s0", i) for i in range(10)]))
    cat.delete_rows_mor(spark, "t", _keys(spark, ["d1"]), ("doc_id",))
    plan = (
        cat.read(spark, "t")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_delete_rejects_unknown_key_column(spark, cat):
    """Review finding: a delete keyed on a column the table lacks would
    commit fine and then break EVERY read — reject at commit time."""
    cat.append("t", _df(spark, [("a", "s0", 1)]))
    with pytest.raises(ValueError, match="key column"):
        cat.delete_rows_mor(
            spark, "t",
            spark.createDataFrame([("x",)], "nope string"), ("nope",),
        )
    assert cat.read(spark, "t").count() == 1


def test_delete_skips_groups_predating_added_key_column(spark, cat):
    """Equality-delete vs add-column schema evolution: files written
    BEFORE the key column existed hold NULL keys — NULL never equals,
    so those groups are untouched (and the read must not crash)."""
    cat.append("t", _df(spark, [("a", "s0", 1)]))  # no uid column yet
    cat.append(
        "t",
        spark.createDataFrame(
            [("b", "s0", 2, "u1"), ("c", "s0", 3, "u2")],
            "doc_id string, source string, n_tok long, uid string",
        ),
    )
    cat.delete_rows_mor(
        spark, "t", spark.createDataFrame([("u1",)], "uid string"), ("uid",)
    )
    got = {(r["doc_id"], r["uid"]) for r in cat.read(spark, "t").collect()}
    assert got == {("a", None), ("c", "u2")}
