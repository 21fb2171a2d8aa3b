"""IcebergLite — snapshot-versioned parquet tables with atomic commits.

The north rule mandates Iceberg-table semantics (snapshot id, atomic
commit, resume-from-snapshot) but no Iceberg runtime jar ships in this
sandbox (SURVEY.md §7.4). This module supplies the minimal subset the
engine needs, behind the same interface a real Iceberg catalog would
serve, so swapping in `spark.read.format("iceberg")` later is a
one-file change.

Layout on disk (all JSON commits are write-tmp-then-``os.replace`` —
atomic on POSIX, so a crash mid-commit leaves the previous snapshot
intact; data files written but not yet referenced by a committed
snapshot are invisible, exactly like Iceberg orphan files):

    <root>/<table>/data/s<commit>/...            parquet (optionally hive
                                                 key=val partition dirs)
    <root>/<table>/metadata/snapshots.json       the snapshot log

``snapshots.json``::

    {"current": 3,
     "refs": {"audited-2026-08": 3},
     "snapshots": [{"id": 1, "parent": 0, "op": "append",
                    "files": [{"path": "s1/source=src0/part-....parquet",
                               "partition": {"source": "src0"}}, ...]}]}

``refs`` are named tags (:meth:`IcebergLite.tag`); a snapshot carrying
``"staged": true`` was committed with ``stage=True`` (write-audit-
publish) and stays invisible to readers and timestamp travel until
:meth:`IcebergLite.publish` moves ``current`` onto it.

Manifest entries carry the partition tuple per file (parsed from the
hive path), so `read(..., partition_filter=...)` prunes at planning
time from the manifest alone — the IcebergLite analog of Iceberg's
manifest-based partition pruning; at 100 TB this is what turns a
per-source query into a scan of one source's files.

Reference analog: the snapshot log is the `.s2s` Specifier + the
write-mode existence checks [U: specification.py :: Specifier.write;
reshaper.py :: output-existence checks] — the substrate that makes
restart idempotent.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotNotFound(KeyError):
    pass


# -- hidden partitioning (Iceberg partition TRANSFORMS) ----------------------
#
# A ``partition_by`` entry may be a plain column name (hive identity
# partitioning) or a transform spec ``bucket(N, col)`` / ``truncate(W,
# col)`` — Iceberg's hidden partitioning: the table is physically laid
# out by a DERIVED value (hash bucket / prefix) that never appears in
# the logical schema. Derived hive columns use the reserved ``_pb_``
# prefix and are stripped on read; :meth:`IcebergLite.eq_filter` maps
# equality predicates on the SOURCE column through the transform so a
# point lookup over 10^12 rows plans to 1/N of the files from the
# manifest alone.

#: reserved hive-column prefix for hidden (transform-derived) partitions
PB_PREFIX = "_pb_"

#: directory name Spark writes for a null/empty partition value
HIVE_DEFAULT_PARTITION = "__HIVE_DEFAULT_PARTITION__"

#: characters Spark's partitioned write %XX-escapes in directory values
#: (ExternalCatalogUtils.escapePathName parity — verified empirically:
#: control chars, DEL, and "#%'*/:=?\^{[] ; note '}' and space are NOT
#: escaped)
_HIVE_ESCAPE_CHARS = (
    frozenset('"#%\'*/:=?\\^{[]')
    | frozenset(chr(c) for c in range(0x20))
    | frozenset({"\x7f"})
)

_TRANSFORM_RE = re.compile(r"^(bucket|truncate)\((\d+)\s*,\s*(\w+)\)$")


def _hive_escape(value) -> str:
    """The directory rendering Spark's partitioned write gives a
    partition VALUE — what :func:`_parse_partition` recovers into the
    manifest. Manifest-side predicate values MUST pass through this
    before comparing against manifest partitions, or any value
    containing an escaped character silently prunes to nothing."""
    if value is None:
        return HIVE_DEFAULT_PARTITION
    s = str(value)
    if s == "":
        return HIVE_DEFAULT_PARTITION
    return "".join(
        f"%{ord(c):02X}" if c in _HIVE_ESCAPE_CHARS else c for c in s
    )


def _parse_spec(entry: str):
    """``"bucket(16,doc_id)"`` → ("bucket", 16, "doc_id", hive_name);
    a plain column name → None (identity partitioning)."""
    if "(" not in entry:
        return None
    m = _TRANSFORM_RE.match(entry.replace(" ", ""))
    if not m:
        raise ValueError(f"unsupported partition transform: {entry!r}")
    kind, n, col = m.group(1), int(m.group(2)), m.group(3)
    if n < 1:
        raise ValueError(f"transform width/buckets must be >= 1: {entry!r}")
    suffix = "bkt" if kind == "bucket" else "trunc"
    return kind, n, col, f"{PB_PREFIX}{col}_{suffix}{n}"


def _h32_py(value) -> int:
    """Python twin of ``functions.xhash.h32`` (md5 word hash) — the
    manifest-side bucket computation MUST match the Spark-side derived
    column byte-for-byte."""
    import hashlib

    return int(hashlib.md5(str(value).encode()).hexdigest()[:8], 16)


def _transform_py(kind: str, n: int, value):
    """Transform output for ``value`` (pre-escaping; None stays None —
    Spark's derived column is NULL for a NULL input, which lands in the
    __HIVE_DEFAULT_PARTITION__ directory)."""
    if value is None:
        return None
    if kind == "bucket":
        return str(_h32_py(value) % n)
    if isinstance(value, str):
        return value[:n]
    return str(value - (value % n))  # python % is pmod for n > 0


def _transform_col(kind: str, n: int, col: str, dtype: str) -> F.Column:
    """Spark column computing the same hive value as
    :func:`_transform_py` (written as a string so the hive directory
    and the manifest-side recomputation agree exactly)."""
    from pyreshaper_spark.functions.xhash import h32

    c = F.col(col)
    if kind == "bucket":
        return F.pmod(h32(c.cast("string")), F.lit(n)).cast("string")
    if dtype == "string":
        return F.substring(c, 1, n)
    return (c - F.pmod(c, F.lit(n))).cast("string")


def _footer_stats(
    path: str, cols: tuple[str, ...]
) -> dict[str, list]:
    """Per-file [min, max] for ``cols`` from the parquet footer only —
    the IcebergLite analog of Iceberg's manifest column stats, enabling
    planning-time FILE skipping without hive partition directories
    (used for tables whose rows are clustered but not partitioned,
    e.g. the encoded-series table)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    out: dict[str, list] = {}
    for c in cols:
        if c not in idx:
            continue
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[c]).statistics
            if st is None or not st.has_min_max:
                break
            mins.append(st.min)
            maxs.append(st.max)
        else:
            if mins:
                out[c] = [min(mins), max(maxs)]
    return out


def _parse_partition(relpath: str) -> dict[str, str]:
    """Extract hive-style ``key=val`` segments from a relative file path."""
    out: dict[str, str] = {}
    for seg in relpath.split(os.sep)[1:-1]:  # skip s<id>/ and the filename
        if "=" in seg:
            k, _, v = seg.partition("=")
            out[k] = v
    return out


class IcebergLite:
    """A tiny snapshot-versioned table catalog over a local/posix root."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths -----------------------------------------------------------
    def _tdir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _data(self, name: str) -> str:
        return os.path.join(self._tdir(name), "data")

    def _log_path(self, name: str) -> str:
        return os.path.join(self._tdir(name), "metadata", "snapshots.json")

    # -- snapshot log ----------------------------------------------------
    def _read_log(self, name: str) -> dict[str, Any]:
        p = self._log_path(name)
        if not os.path.exists(p):
            return {"current": 0, "snapshots": []}
        with open(p) as f:
            return json.load(f)

    def _next_sid(self, name: str) -> int:
        """Next snapshot id: one past the max of current and every
        recorded snapshot (staged snapshots sit in the list WITHOUT
        advancing current, so ``current + 1`` alone could collide)."""
        log = self._read_log(name)
        return max([log["current"], *(s["id"] for s in log["snapshots"])]) + 1

    def _write_log(self, name: str, log: dict) -> None:
        p = self._log_path(name)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(log, f)
        os.replace(tmp, p)  # the atomic commit point

    def _commit(
        self,
        name: str,
        files: list[dict],
        op: str,
        schema: str | None = None,
        stage: bool = False,
        deletes: list[dict] | None = None,
        parent_id: int | None = None,
        commit_key: str | None = None,
    ) -> int:
        """Atomically append a snapshot referencing ``files`` (full live set).

        ``schema`` (Spark schema JSON) is recorded per snapshot — like
        Iceberg's per-snapshot schema — so readers can type an EMPTY
        snapshot (e.g. a fully-pruned table's changelog).

        ``stage``: record the snapshot WITHOUT advancing ``current`` —
        the write half of write-audit-publish. Readers keep seeing the
        published state; the staged snapshot is readable only by
        explicit id (or a tag) until :meth:`publish` moves current.

        ``deletes``: the snapshot's live EQUALITY-DELETE files (see
        :meth:`delete_rows_mor`) — each ``{"paths": [rel...],
        "key_cols": [...], "seq": commit-id}``, applied at read time to
        data files with a strictly older sequence number."""
        import time

        log = self._read_log(name)
        sid = max([log["current"], *(s["id"] for s in log["snapshots"])]) + 1
        snap = {
            "id": sid,
            "parent": (
                log["current"] if parent_id is None else parent_id
            ),
            "op": op,
            "ts": time.time(),
            "files": files,
        }
        if schema is not None:
            snap["schema"] = schema
        if deletes:
            snap["deletes"] = deletes
        if stage:
            snap["staged"] = True
        if commit_key is not None:
            snap["commit_key"] = commit_key
        log["snapshots"].append(snap)
        if not stage:
            log["current"] = sid
        self._write_log(name, log)
        return sid

    def snapshots(self, name: str) -> list[dict]:
        return self._read_log(name)["snapshots"]

    def snapshot_as_of(self, name: str, ts: float) -> int:
        """Iceberg ``FOR TIMESTAMP AS OF``: the id of the last snapshot
        committed at or before wall-clock ``ts`` (epoch seconds).
        Raises if the table did not exist yet. Snapshots written before
        commit timestamps were recorded (no ``ts`` field) are treated
        as infinitely old — still reachable by any later ts."""
        best = 0
        for s in self._read_log(name)["snapshots"]:
            if s.get("staged"):
                continue  # never published — not part of table history
            if s.get("ts", 0.0) <= ts:
                best = s["id"]
        if best == 0:
            raise SnapshotNotFound(f"{name}: no snapshot at or before {ts}")
        return best

    def current_snapshot_id(self, name: str) -> int:
        return self._read_log(name)["current"]

    # -- refs: tags + write-audit-publish ---------------------------------
    def tag(
        self,
        name: str,
        tag_name: str,
        snapshot_id: int | None = None,
        replace: bool = False,
    ) -> int:
        """Name a snapshot (Iceberg tag): a durable ref that time
        travel can use (``read(tag=...)``) and that
        :meth:`expire_snapshots` will never drop. Defaults to the
        current snapshot; refuses to move an existing tag unless
        ``replace=True``."""
        log = self._read_log(name)
        sid = log["current"] if snapshot_id is None else snapshot_id
        if not any(s["id"] == sid for s in log["snapshots"]):
            raise SnapshotNotFound(f"{name}@{sid}")
        refs = log.setdefault("refs", {})
        if tag_name in refs and refs[tag_name] != sid and not replace:
            raise ValueError(
                f"tag {tag_name!r} already points at {refs[tag_name]} "
                "(pass replace=True to move it)"
            )
        refs[tag_name] = sid
        self._write_log(name, log)
        return sid

    def drop_tag(self, name: str, tag_name: str) -> None:
        log = self._read_log(name)
        if tag_name not in log.get("refs", {}):
            raise KeyError(f"{name}: no tag {tag_name!r}")
        del log["refs"][tag_name]
        self._write_log(name, log)

    def tags(self, name: str) -> dict[str, int]:
        return dict(self._read_log(name).get("refs", {}))

    def resolve_tag(self, name: str, tag_name: str) -> int:
        refs = self._read_log(name).get("refs", {})
        if tag_name not in refs:
            raise SnapshotNotFound(f"{name}: no tag {tag_name!r}")
        return refs[tag_name]

    def publish(self, name: str, snapshot_id: int) -> int:
        """Move ``current`` to an existing snapshot — the publish half
        of write-audit-publish: ``append(..., stage=True)`` writes an
        invisible snapshot, audit jobs read it by id (or tag), and
        publish makes it the table state atomically. Publishing an
        older id is also how a bad published commit is rolled back
        (Iceberg ``rollback_to_snapshot``)."""
        log = self._read_log(name)
        for s in log["snapshots"]:
            if s["id"] == snapshot_id:
                s.pop("staged", None)
                log["current"] = snapshot_id
                self._write_log(name, log)
                return snapshot_id
        raise SnapshotNotFound(f"{name}@{snapshot_id}")

    # -- branches: isolated multi-commit write lineages --------------------
    def create_branch(
        self, name: str, branch_name: str, snapshot_id: int | None = None
    ) -> int:
        """Create a BRANCH ref (Iceberg branch): an independent commit
        lineage starting at ``snapshot_id`` (default: current). Writes
        with ``branch=`` chain onto the branch head as STAGED snapshots
        — readers of the table keep seeing the published main state
        until :meth:`fast_forward` moves ``current`` onto the branch
        head. This is multi-commit write-audit-publish: an ingest job
        can land several commits on an ``audit`` branch, validation
        reads the branch, and one atomic fast-forward publishes all of
        them (or none)."""
        log = self._read_log(name)
        sid = log["current"] if snapshot_id is None else snapshot_id
        if sid != 0 and not any(s["id"] == sid for s in log["snapshots"]):
            raise SnapshotNotFound(f"{name}@{sid}")
        branches = log.setdefault("branches", {})
        if branch_name in branches:
            raise ValueError(f"branch {branch_name!r} already exists")
        branches[branch_name] = sid
        self._write_log(name, log)
        return sid

    def branches(self, name: str) -> dict[str, int]:
        return dict(self._read_log(name).get("branches", {}))

    def resolve_branch(self, name: str, branch_name: str) -> int:
        br = self._read_log(name).get("branches", {})
        if branch_name not in br:
            raise SnapshotNotFound(f"{name}: no branch {branch_name!r}")
        return br[branch_name]

    def drop_branch(self, name: str, branch_name: str) -> None:
        log = self._read_log(name)
        if branch_name not in log.get("branches", {}):
            raise KeyError(f"{name}: no branch {branch_name!r}")
        del log["branches"][branch_name]
        self._write_log(name, log)

    def _advance_branch(self, name: str, branch_name: str, sid: int) -> None:
        log = self._read_log(name)
        log.setdefault("branches", {})[branch_name] = sid
        self._write_log(name, log)

    def _ancestors(self, name: str, sid: int) -> set[int]:
        """Snapshot ids on the parent chain from ``sid`` down to the
        table root (inclusive of ``sid`` and of id 0)."""
        by_id = {s["id"]: s for s in self._read_log(name)["snapshots"]}
        out = {0}
        while sid in by_id:
            out.add(sid)
            sid = by_id[sid].get("parent", 0)
        return out

    def fast_forward(self, name: str, branch_name: str) -> int:
        """Publish a branch: atomically move ``current`` onto the
        branch head (Iceberg's ``fast_forward``). Refuses when the
        published state is NOT an ancestor of the branch head — main
        moved on since the branch was cut, and "publishing" the branch
        would silently un-publish main's intervening commits (real
        Iceberg fast-forward has the same guard; resolve by rebasing:
        re-run the branch job from a fresh branch). The head snapshot
        loses its staged flag; the branch's INTERMEDIATE snapshots stay
        staged (branch history — readable by explicit id, invisible to
        timestamp travel, reclaimable by expiry once the branch is
        dropped)."""
        head = self.resolve_branch(name, branch_name)
        cur = self.current_snapshot_id(name)
        if cur not in self._ancestors(name, head):
            raise ValueError(
                f"fast_forward: current snapshot {cur} is not an ancestor "
                f"of branch {branch_name!r} head {head} — main advanced "
                "since the branch was cut; rebase the branch instead"
            )
        return self.publish(name, head)

    def _snapshot(self, name: str, snapshot_id: int | None) -> dict:
        log = self._read_log(name)
        sid = log["current"] if snapshot_id is None else snapshot_id
        if sid == 0:
            return {"id": 0, "files": []}
        for s in log["snapshots"]:
            if s["id"] == sid:
                return s
        raise SnapshotNotFound(f"{name}@{sid}")

    # -- writes ----------------------------------------------------------
    def _write_data(
        self,
        name: str,
        df: DataFrame,
        partition_by: tuple[str, ...],
        stats_cols: tuple[str, ...] = (),
        options: dict | None = None,
    ) -> list[dict]:
        sid = self._next_sid(name)
        ddir = os.path.join(self._data(name), f"s{sid}")
        if any(c.startswith(PB_PREFIX) for c in df.columns):
            raise ValueError(
                f"column prefix {PB_PREFIX!r} is reserved for hidden "
                "partition transforms"
            )
        # hidden partitioning: materialize transform specs as derived
        # _pb_ hive columns (directory-encoded only — partitionBy keeps
        # them out of the parquet payload; the read path strips them)
        hive_cols: list[str] = []
        for entry in partition_by:
            spec = _parse_spec(entry)
            if spec is None:
                hive_cols.append(entry)
                continue
            kind, n, col, hname = spec
            dtype = dict(df.dtypes).get(col)
            if dtype is None:
                raise ValueError(f"transform column not in schema: {entry!r}")
            df = df.withColumn(hname, _transform_col(kind, n, col, dtype))
            hive_cols.append(hname)
        w = df.write.mode("overwrite")
        for k, v in (options or {}).items():
            w = w.option(k, v)
        if hive_cols:
            w = w.partitionBy(*hive_cols)
        w.parquet(ddir)
        paths = sorted(
            glob.glob(os.path.join(ddir, "**", "*.parquet"), recursive=True)
        )
        stats: dict[str, dict] = {}
        if stats_cols and paths:
            # footer reads are tiny but latency-bound — overlap them
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(min(8, len(paths))) as ex:
                for p, st in zip(
                    paths, ex.map(lambda q: _footer_stats(q, stats_cols), paths)
                ):
                    stats[p] = st
        files = []
        for p in paths:
            rel = os.path.relpath(p, self._data(name))
            entry = {"path": rel, "partition": _parse_partition(rel)}
            if stats_cols:
                entry["stats"] = stats[p]
            files.append(entry)
        return files

    def create_table(self, name: str, schema_json: str) -> int:
        """Idempotent CREATE TABLE: commit a zero-file snapshot that
        records the table schema, so the table exists (and an empty
        read can be typed via ``read(allow_empty=True)``) before any
        data lands — Iceberg's create-before-stream contract for
        streaming sinks. No-op when the table is already READABLE
        (``current > 0``, matching :meth:`exists`; the current id is
        returned unchanged and the schema argument is ignored — schema
        evolution goes through ``add_column``). A table holding only
        STAGED snapshots is not yet readable on main, so create still
        commits the typed empty head (staged snapshots keep their ids
        and publish as before)."""
        log = self._read_log(name)
        if log["current"]:
            return log["current"]
        return self._commit(name, [], "create", schema_json)

    def append(
        self,
        name: str,
        df: DataFrame,
        partition_by: tuple[str, ...] = (),
        stats_cols: tuple[str, ...] = (),
        options: dict | None = None,
        gate=None,
        stage: bool = False,
        branch: str | None = None,
    ) -> int:
        new = self._write_data(name, df, partition_by, stats_cols, options)
        if gate is not None:
            # barrier between the (expensive, side-effect-free) data-file
            # write and the atomic manifest commit: a raising gate leaves
            # orphan files but NO snapshot references them — the table is
            # unchanged (the next write to this sid overwrites the dir).
            # The pipeline uses this to overlap encode with validation
            # while keeping "invalid input commits nothing" airtight.
            gate()
        if branch is not None:
            # branch writes chain onto the BRANCH head (staged — main
            # readers unaffected until fast_forward publishes the head)
            base_sid = self.resolve_branch(name, branch)
            parent = self._snapshot(name, base_sid)
            sid = self._commit(
                name, parent["files"] + new, "append", df.schema.json(),
                stage=True, deletes=parent.get("deletes"),
                parent_id=base_sid,
            )
            self._advance_branch(name, branch, sid)
            return sid
        parent = self._snapshot(name, None)
        live = parent["files"] + new
        # equality-delete files stay live: they apply to the OLD data
        # files (seq < delete seq), never to this append's new files
        return self._commit(
            name, live, "append", df.schema.json(), stage,
            deletes=parent.get("deletes"),
        )

    def _has_rows(self, name: str, files: list[dict]) -> bool:
        """True if any of the just-written manifest entries holds rows
        — parquet-footer reads only, stopping at the first non-empty
        file (the common 1-file case costs one footer)."""
        import pyarrow.parquet as pq

        data = self._data(name)
        return any(
            pq.ParquetFile(os.path.join(data, f["path"])).metadata.num_rows
            > 0
            for f in files
        )

    def append_once(
        self,
        name: str,
        df: DataFrame,
        key: str,
        partition_by: tuple[str, ...] = (),
        stats_cols: tuple[str, ...] = (),
        options: dict | None = None,
    ) -> int:
        """Idempotent append: commit ``df`` tagged with ``key`` unless a
        snapshot carrying that key already exists — Iceberg's
        commit-dedup for exactly-once streaming sinks (the key is
        typically ``<sink-id>:<epoch-id>``; a replayed foreachBatch
        epoch finds its own earlier commit and no-ops). The key check
        happens BEFORE any data is written, so a duplicate costs one
        manifest read, zero parquet writes."""
        for s in self._read_log(name)["snapshots"]:
            if s.get("commit_key") == key:
                return s["id"]
        new = self._write_data(name, df, partition_by, stats_cols, options)
        parent = self._snapshot(name, None)
        if not self._has_rows(name, new):
            # empty epoch: no rows → no snapshot, no key recorded (a
            # replay is vacuously idempotent). Emptiness comes from the
            # WRITTEN files (zero files for a partitioned write; footer
            # num_rows otherwise — early-exit, driver-local), so idle
            # micro-batches don't grow the snapshot log and the
            # foreachBatch sink needs no per-batch isEmpty() pre-scan
            # re-running the batch source. The empty part file, if any,
            # is unreferenced — remove_orphan_files sweeps it.
            return parent["id"]
        return self._commit(
            name, parent["files"] + new, "append", df.schema.json(),
            deletes=parent.get("deletes"), commit_key=key,
        )

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
        new = self._write_data(name, df, partition_by, stats_cols, options)
        if gate is not None:
            gate()  # see append(): pre-commit barrier, orphan-safe
        return self._commit(name, new, "overwrite", df.schema.json(), stage)

    def overwrite_partitions(
        self, name: str, df: DataFrame, keys: tuple[str, ...]
    ) -> int:
        """Dynamic partition overwrite: replace exactly the partitions
        present in ``df``, keep the rest — Iceberg's `overwritePartitions`.

        NOTE: the replaced partitions' rows come verbatim from ``df`` —
        callers on tables carrying equality deletes should write the
        already-delete-applied read (the kept partitions' delete
        entries are carried forward)."""
        parent = self._snapshot(name, None)
        new = self._write_data(name, df, keys)
        replaced = {tuple(sorted(f["partition"].items())) for f in new}
        kept = [
            f
            for f in parent["files"]
            if tuple(sorted(f["partition"].items())) not in replaced
        ]
        return self._commit(
            name, kept + new, "overwrite_partitions", df.schema.json(),
            deletes=self._applicable_deletes(parent.get("deletes"), kept),
        )

    # -- reads -----------------------------------------------------------
    def read(
        self,
        spark: SparkSession,
        name: str,
        snapshot_id: int | None = None,
        partition_filter: Callable[[dict[str, str]], bool] | None = None,
        stats_filter: Callable[[dict[str, list]], bool] | None = None,
        allow_empty: bool = False,
        tag: str | None = None,
        apply_deletes: bool = True,
        branch: str | None = None,
    ) -> DataFrame:
        """Read a snapshot (time travel via ``snapshot_id`` / ``tag``,
        or a branch head via ``branch`` — staged branch commits are
        readable here before they are published).

        ``partition_filter`` prunes files from the manifest BEFORE any
        parquet is opened (planning-time partition pruning). Files are
        grouped per commit dir and each group is read with its own
        ``basePath`` so hive partition columns are recovered, then
        unioned by name — commit count is small, file count is what
        scales, so the union stays cheap.

        ``allow_empty``: when the snapshot has no (surviving) files,
        return an EMPTY DataFrame typed from the recorded snapshot
        schema instead of raising — for callers where "filter pruned
        everything" is a legitimate state (e.g. repairing a source all
        of whose rows aged out of a retention-pruned tier).

        ``apply_deletes``: apply the snapshot's equality-delete files
        (see :meth:`delete_rows_mor`) — a broadcast anti-join per
        delete file against the data files it covers. Pass ``False``
        to see the raw data files (merge-on-read debugging).
        """
        if tag is not None:
            if snapshot_id is not None:
                raise ValueError("pass snapshot_id OR tag, not both")
            snapshot_id = self.resolve_tag(name, tag)
        if branch is not None:
            if snapshot_id is not None or tag is not None:
                raise ValueError("pass snapshot_id OR tag OR branch")
            snapshot_id = self.resolve_branch(name, branch)
        snap = self._snapshot(name, snapshot_id)
        files = snap["files"]
        if partition_filter is not None:
            files = [f for f in files if partition_filter(f["partition"])]
        if stats_filter is not None:
            # keep files with NO stats (cannot prove they don't match)
            files = [
                f
                for f in files
                if not f.get("stats") or stats_filter(f["stats"])
            ]
        if not files:
            schema_json = snap.get("schema")
            if allow_empty and schema_json is not None:
                from pyspark.sql.types import StructType

                return spark.createDataFrame(
                    [], StructType.fromJson(json.loads(schema_json))
                )
            raise SnapshotNotFound(
                f"{name}@{snap.get('id')}: no files (empty snapshot or "
                "filter pruned everything)"
            )
        deletes = snap.get("deletes") if apply_deletes else None
        return self._df_for_files(spark, name, files, deletes)

    def _df_for_files(
        self,
        spark: SparkSession,
        name: str,
        files: list[dict],
        deletes: list[dict] | None = None,
    ) -> DataFrame:
        """DataFrame over an explicit manifest-file subset. Files are
        grouped per commit dir and each group read with its own
        ``basePath`` so hive partition columns are recovered, then
        unioned by name.

        Schema evolution (add-column): commits may carry different
        column sets; the union aligns by NAME and null-fills columns a
        commit predates — Iceberg's add-column read semantics. (True
        drop/rename needs field-id tracking and is out of scope; a
        rename reads as drop+add.)

        ``deletes`` (equality-delete entries): applied PER COMMIT
        GROUP — a delete covers only data files with a strictly older
        sequence number (Iceberg v2 semantics: a row re-inserted after
        the delete survives). Each application is a broadcast
        ``left_anti`` join on the delete's key columns; delete files
        are tiny by construction (keys only), so this never shuffles
        the data side.
        """
        data = self._data(name)
        by_commit: dict[str, list[str]] = {}
        for f in files:
            sdir = f["path"].split(os.sep, 1)[0]
            by_commit.setdefault(sdir, []).append(os.path.join(data, f["path"]))
        keyed = (
            self._delete_keys(spark, name, deletes) if deletes else []
        )
        schema_by_id = {
            s["id"]: s.get("schema")
            for s in self._read_log(name)["snapshots"]
        }
        parts = []
        for sdir, paths in sorted(by_commit.items()):
            reader = spark.read.option("basePath", os.path.join(data, sdir))
            # hive partition columns come back TYPE-INFERRED from the
            # directory strings, and a post-hoc cast CANNOT undo that:
            # a string partition value '00' is inferred as int 0 and
            # casts back to '0' — silent corruption. Supplying the
            # commit's recorded schema makes Spark parse each directory
            # value directly AS the declared type (a string column
            # keeps its exact text), so the logical type AND value
            # survive the round-trip. Hidden `_pb_*` transform columns
            # are not in the logical schema; they still surface
            # (inferred) and are dropped below.
            sj = schema_by_id.get(self._file_seq(sdir))
            if sj is not None:
                from pyspark.sql.types import StructType

                reader = reader.schema(StructType.fromJson(json.loads(sj)))
            df = reader.parquet(*paths)
            if keyed:
                df = self._anti_join_deletes(df, keyed, self._file_seq(sdir))
            parts.append(df)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p, allowMissingColumns=True)
        # hidden partitioning: transform-derived hive columns are
        # physical layout, not logical schema — strip them (Iceberg
        # semantics: a bucket(16, doc_id) table still reads as its
        # declared columns)
        hidden = [c for c in df.columns if c.startswith(PB_PREFIX)]
        return df.drop(*hidden) if hidden else df

    @staticmethod
    def eq_filter(
        partition_by: tuple[str, ...], where_eq: dict[str, list]
    ) -> Callable[[dict[str, str]], bool]:
        """Build a manifest ``partition_filter`` from equality
        predicates on SOURCE columns, mapped through the table's
        partition spec (identity columns AND hidden transforms) —
        Iceberg's predicate-to-partition-transform pushdown.

        Evolution-safe: a file whose partition tuple lacks the key
        (written under an older spec) cannot prove non-match and is
        kept."""
        expected: dict[str, set[str]] = {}
        for entry in partition_by:
            spec = _parse_spec(entry)
            if spec is None:
                if entry in where_eq:
                    # manifest partitions hold the hive-ESCAPED dir
                    # value — compare escaped-to-escaped
                    expected[entry] = {
                        _hive_escape(v) for v in where_eq[entry]
                    }
                continue
            kind, n, col, hname = spec
            if col in where_eq:
                expected[hname] = {
                    _hive_escape(_transform_py(kind, n, v))
                    for v in where_eq[col]
                }
        def _keep(part: dict[str, str]) -> bool:
            return all(
                part[k] in allowed
                for k, allowed in expected.items()
                if k in part
            )
        return _keep

    # -- merge-on-read (equality) deletes ---------------------------------
    @staticmethod
    def _file_seq(path: str) -> int:
        """Data sequence number of a manifest path: the commit id in
        its leading directory (``s7/...`` → 7, ``d7/...`` → 7). Files
        carried across commits keep their original directory, so the
        sequence survives any number of snapshot hops."""
        return int(path.split(os.sep, 1)[0][1:])

    @classmethod
    def _applicable_deletes(
        cls, deletes: list[dict] | None, files: list[dict]
    ) -> list[dict] | None:
        """The subset of ``deletes`` that still covers at least one of
        ``files`` (a delete applies to data files with seq < its own).
        Rewrites call this to drop delete files the rewrite
        materialized — full compaction leaves the table delete-free."""
        if not deletes:
            return None
        seqs = [cls._file_seq(f["path"]) for f in files]
        return [d for d in deletes if any(s < d["seq"] for s in seqs)] or None

    def _delete_keys(
        self, spark: SparkSession, name: str, deletes: list[dict]
    ) -> list[tuple[int, list[str], DataFrame]]:
        """Materialize each delete entry's key DataFrame ONCE (they are
        re-applied per commit group — G groups x D deletes must not
        plan G x D parquet scans of the same tiny files)."""
        data = self._data(name)
        return [
            (
                d["seq"],
                list(d["key_cols"]),
                spark.read.parquet(
                    *(os.path.join(data, p) for p in d["paths"])
                ),
            )
            for d in sorted(deletes, key=lambda d: d["seq"])
        ]

    @staticmethod
    def _anti_join_deletes(
        df: DataFrame,
        keyed: list[tuple[int, list[str], DataFrame]],
        data_seq: int,
    ) -> DataFrame:
        for seq, key_cols, keys in keyed:
            if seq <= data_seq:
                continue
            if any(c not in df.columns for c in key_cols):
                # equality-delete semantics: a row whose key column is
                # absent (file predates an add-column evolution) has a
                # NULL key — NULL never equals, so the group is untouched
                continue
            df = df.join(F.broadcast(keys), key_cols, "left_anti")
        return df

    def delete_rows_mor(
        self,
        spark: SparkSession,
        name: str,
        keys: DataFrame,
        key_cols: tuple[str, ...],
    ) -> int:
        """Merge-on-read row-level delete — Iceberg v2 EQUALITY-DELETE
        files. Copy-on-write (:meth:`replace_rows`) rewrites every file
        that COULD hold a matching row; at 100 TB that is a gigabyte of
        rewrite per deleted document. This instead writes only the key
        set (one tiny parquet file) and commits a snapshot whose
        manifest references the SAME data files plus the delete entry;
        readers subtract the keys with a broadcast anti-join, applied
        only to data files with an older sequence number (so a later
        re-insert of the same key survives — Iceberg v2 sequence-number
        semantics). Compaction (:meth:`compact` / :meth:`zorder_compact`)
        materializes outstanding deletes into the rewritten files and
        drops entries no remaining file needs.

        Delete cost: O(keys). Read cost: one broadcast anti-join per
        outstanding delete file — which is why periodic compaction
        matters, exactly as with real Iceberg MOR tables.

        Time travel across the delete works: prior snapshots carry no
        delete entry and read the original rows.

        Returns the new snapshot id.
        """
        snap = self._snapshot(name, None)
        if not snap["files"]:
            raise SnapshotNotFound(f"{name}: empty table")
        # a delete keyed on a column the table doesn't have would commit
        # fine and then break EVERY subsequent read's anti-join — reject
        # at commit time against the current table schema
        if snap.get("schema") is not None:
            cols = {
                f["name"]
                for f in json.loads(snap["schema"]).get("fields", [])
            }
        else:
            cols = set(self._df_for_files(spark, name, snap["files"]).columns)
        missing = [c for c in key_cols if c not in cols]
        if missing:
            raise ValueError(
                f"delete_rows_mor: key column(s) {missing} not in "
                f"{name}'s current schema {sorted(cols)}"
            )
        sid = self._next_sid(name)
        ddir = os.path.join(self._data(name), f"d{sid}")
        # keys are small by contract (a compliance batch, not a corpus);
        # one file keeps the read-side broadcast single-shot
        keys.select(*key_cols).distinct().coalesce(1).write.mode(
            "overwrite"
        ).parquet(ddir)
        paths = sorted(
            os.path.relpath(p, self._data(name))
            for p in glob.glob(os.path.join(ddir, "*.parquet"))
        )
        entry = {"paths": paths, "key_cols": list(key_cols), "seq": sid}
        return self._commit(
            name,
            snap["files"],
            "delete",
            snap.get("schema"),
            deletes=(snap.get("deletes") or []) + [entry],
        )

    def read_changes(
        self,
        spark: SparkSession,
        name: str,
        from_snapshot_id: int,
        to_snapshot_id: int | None = None,
        eliminate_carryovers: bool = True,
    ) -> DataFrame:
        """Incremental / CDC changelog read — Iceberg's
        ``create_changelog_view``: every row change between two
        snapshots, tagged ``_change_type`` ∈ {insert, delete}.

        The diff is computed on the MANIFEST (file sets), so the
        common append-only case reads exactly the files added since
        ``from_snapshot_id`` — O(new data), never a table scan. That
        is the incremental-consumer contract: a downstream job
        checkpoints the snapshot id it last saw and reads only the
        delta.

        Copy-on-write rewrites (:meth:`replace_rows`, :meth:`compact`)
        carry unchanged rows through both the removed and added file
        sets; with ``eliminate_carryovers`` those are cancelled by a
        multiset ``exceptAll`` in each direction (Iceberg's
        carryover-row removal), leaving only net inserts/deletes.
        The exceptAll cost is bounded by the REWRITTEN files, not the
        table. Pure compaction therefore yields an empty changelog.
        """
        from_snap = self._snapshot(name, from_snapshot_id)
        from_files = {f["path"] for f in from_snap["files"]}
        to_snap = self._snapshot(name, to_snapshot_id)
        to_files = {f["path"] for f in to_snap["files"]}
        added = [f for f in to_snap["files"] if f["path"] not in from_files]
        removed = [
            f for f in from_snap["files"] if f["path"] not in to_files
        ]
        # merge-on-read equality deletes committed in the range change
        # NO data files — their net row deletions are computed from the
        # delete keys against the data files that survive in BOTH
        # snapshots (rewritten files are already accounted by the file
        # diff; rows MOR-deleted before the range are masked by earlier
        # delete entries so they never re-emit)
        from_del_ids = {d["seq"] for d in from_snap.get("deletes") or []}
        to_dels = to_snap.get("deletes") or []
        del_parts: list[DataFrame] = []
        for d in to_dels:
            if d["seq"] in from_del_ids:
                continue
            common = [
                f
                for f in to_snap["files"]
                if f["path"] in from_files
                and self._file_seq(f["path"]) < d["seq"]
            ]
            if not common:
                continue
            prior = [x for x in to_dels if x["seq"] < d["seq"]]
            base = self._df_for_files(spark, name, common, prior or None)
            keys = spark.read.parquet(
                *(os.path.join(self._data(name), p) for p in d["paths"])
            )
            del_parts.append(
                base.join(F.broadcast(keys), list(d["key_cols"]), "left_semi")
                .withColumn("_change_type", F.lit("delete"))
            )
        tag = F.lit("insert")
        if not added and not removed and not del_parts:
            # no file changes → EMPTY changelog (an incremental consumer
            # polling an idle — or fully-pruned — table must get zero
            # rows, never an exception). Type it from the to-snapshot's
            # files if any, else from the recorded snapshot schema, else
            # from any snapshot in the log that still has files.
            if to_snap["files"]:
                return (
                    self._df_for_files(spark, name, to_snap["files"])
                    .limit(0)
                    .withColumn("_change_type", tag)
                )
            schema_json = to_snap.get("schema")
            if schema_json is None:
                for s in reversed(self._read_log(name)["snapshots"]):
                    if s.get("schema") or s["files"]:
                        if s.get("schema"):
                            schema_json = s["schema"]
                        else:
                            return (
                                self._df_for_files(spark, name, s["files"])
                                .limit(0)
                                .withColumn("_change_type", tag)
                            )
                        break
            if schema_json is None:
                raise SnapshotNotFound(
                    f"{name}: empty table with no recorded schema"
                )
            from pyspark.sql.types import StructType

            return spark.createDataFrame(
                [], StructType.fromJson(json.loads(schema_json))
            ).withColumn("_change_type", tag)
        # added files read under the TO snapshot's deletes (a delete in
        # the range may cover a file also added in the range — those
        # rows net to nothing); removed files under FROM's (rows gone
        # before the range must not re-emit as deletes)
        ins = (
            self._df_for_files(spark, name, added, to_snap.get("deletes"))
            if added
            else None
        )
        dels = (
            self._df_for_files(spark, name, removed, from_snap.get("deletes"))
            if removed
            else None
        )
        if (
            ins is not None
            and dels is not None
            and eliminate_carryovers
            # a schema-evolved rewrite cannot carry rows verbatim
            and set(ins.columns) == set(dels.columns)
        ):
            ins, dels = (
                ins.exceptAll(dels.select(*ins.columns)),
                dels.select(*ins.columns).exceptAll(ins),
            )
        parts = []
        if ins is not None:
            parts.append(ins.withColumn("_change_type", tag))
        if dels is not None:
            parts.append(dels.withColumn("_change_type", F.lit("delete")))
        parts.extend(del_parts)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out

    def partitions(
        self, name: str, snapshot_id: int | None = None
    ) -> set[tuple[tuple[str, str], ...]]:
        """Distinct partition tuples in a snapshot — from the manifest only."""
        snap = self._snapshot(name, snapshot_id)
        return {tuple(sorted(f["partition"].items())) for f in snap["files"]}

    def exists(self, name: str) -> bool:
        return self.current_snapshot_id(name) > 0

    def capabilities(self) -> frozenset[str]:
        """The reference binding declares every optional group (see
        ``catalog.CAPABILITY_METHODS``)."""
        return frozenset(
            {"snapshots", "cdc", "mutation", "maintenance", "refs"}
        )

    def list_tables(self) -> list[str]:
        """All table names under the warehouse root that carry a
        snapshot log — including tables whose only commits are staged
        (``current == 0``), which :meth:`exists` reports False for but
        maintenance still owns. Public face of the old private
        ``_log_path`` probe the maintenance walk used."""
        if not os.path.isdir(self.root):
            return []
        return sorted(
            d
            for d in os.listdir(self.root)
            if os.path.exists(self._log_path(d))
        )

    def is_partitioned(self, name: str) -> bool:
        """Whether the current snapshot's files carry hive partition
        values — manifest-only, no parquet opened. Drives the
        compaction grouping choice in ``pipeline.maintain``."""
        return any(
            f["partition"] for f in self._snapshot(name, None)["files"]
        )

    def table_schema_json(self, name: str) -> str | None:
        """The current snapshot's recorded schema (Spark JSON), or
        None when the table predates schema recording. Public face of
        the ``_snapshot(...)["schema"]`` probe the maintain CLI used."""
        return self._snapshot(name, None).get("schema")

    # -- metadata tables (Iceberg's t.snapshots / t.files / t.history /
    # t.refs inspection surface). Built driver-side from the manifest —
    # exactly where Iceberg itself plans from — so they are O(manifest),
    # never O(data), and come back as ordinary DataFrames that can be
    # joined/filtered like any other relation.
    def inspect_snapshots(self, spark: SparkSession, name: str) -> DataFrame:
        """One row per recorded snapshot (published AND staged):
        (snapshot_id, parent_id, operation, committed_at_s, is_staged,
        is_current, n_data_files, n_delete_files)."""
        log = self._read_log(name)
        rows = [
            (
                s["id"],
                s.get("parent", 0),
                s["op"],
                float(s.get("ts", 0.0)),
                bool(s.get("staged", False)),
                s["id"] == log["current"],
                len(s["files"]),
                sum(len(d["paths"]) for d in s.get("deletes", [])),
            )
            for s in log["snapshots"]
        ]
        return spark.createDataFrame(
            rows,
            "snapshot_id long, parent_id long, operation string, "
            "committed_at_s double, is_staged boolean, is_current boolean, "
            "n_data_files int, n_delete_files int",
        )

    def inspect_files(
        self,
        spark: SparkSession,
        name: str,
        snapshot_id: int | None = None,
        with_rows: bool = False,
    ) -> DataFrame:
        """One row per live file at a snapshot: (content, file_path,
        partition map, seq, stats min/max map, record_count). ``seq`` is
        the commit sequence number MOR deletes compare against.
        ``with_rows=True`` additionally reads each parquet footer for
        ``record_count`` (|files| tiny metadata reads — opt-in, like
        Iceberg's files-table record_count which it keeps in manifests)."""
        snap = self._snapshot(name, snapshot_id)
        entries: list[tuple] = []
        for f in snap["files"]:
            entries.append(("data", f["path"], f.get("partition", {}),
                            self._file_seq(f["path"]),
                            {k: [str(v[0]), str(v[1])]
                             for k, v in f.get("stats", {}).items()}))
        for d in snap.get("deletes", []):
            for p in d["paths"]:
                entries.append(("equality-deletes", p, {}, d["seq"], {}))
        counts: dict[str, int | None] = {}
        if with_rows:
            import pyarrow.parquet as pq
            from concurrent.futures import ThreadPoolExecutor

            data = self._data(name)
            paths = [e[1] for e in entries]
            with ThreadPoolExecutor(min(8, max(1, len(paths)))) as ex:
                for rel, n in zip(paths, ex.map(
                    lambda r: pq.ParquetFile(
                        os.path.join(data, r)).metadata.num_rows, paths
                )):
                    counts[rel] = n
        rows = [(*e, counts.get(e[1])) for e in entries]
        return spark.createDataFrame(
            rows,
            "content string, file_path string, partition map<string,string>, "
            "seq long, stats map<string,array<string>>, record_count long",
        )

    def inspect_history(self, spark: SparkSession, name: str) -> DataFrame:
        """Published table history — every non-staged snapshot with
        whether it is an ancestor of current (Iceberg's history table;
        rollback via publish() makes superseded lineage visible as
        is_current_ancestor=false)."""
        log = self._read_log(name)
        anc = self._ancestors(name, log["current"]) if log["current"] else set()
        rows = [
            (float(s.get("ts", 0.0)), s["id"], s.get("parent", 0),
             s["id"] in anc)
            for s in log["snapshots"]
            if not s.get("staged")
        ]
        return spark.createDataFrame(
            rows,
            "made_current_at_s double, snapshot_id long, parent_id long, "
            "is_current_ancestor boolean",
        )

    def inspect_refs(self, spark: SparkSession, name: str) -> DataFrame:
        """All named refs plus main: (ref_name, ref_type, snapshot_id)."""
        log = self._read_log(name)
        rows = [("main", "branch", log["current"])]
        rows += [(t, "tag", sid) for t, sid in
                 sorted(log.get("refs", {}).items())]
        rows += [(b, "branch", sid) for b, sid in
                 sorted(log.get("branches", {}).items())]
        return spark.createDataFrame(
            rows, "ref_name string, ref_type string, snapshot_id long"
        )

    def replace_rows(
        self,
        spark: SparkSession,
        name: str,
        keys: DataFrame,
        key_cols: tuple[str, ...],
        replacement: DataFrame | None = None,
        partition_filter: Callable[[dict[str, str]], bool] | None = None,
        stats_filter: Callable[[dict[str, list]], bool] | None = None,
        partition_by: tuple[str, ...] = (),
        stats_cols: tuple[str, ...] = (),
        options: dict | None = None,
    ) -> tuple[int, int, int]:
        """Copy-on-write row-level delete/upsert — Iceberg's
        ``MERGE``/``DELETE`` with copy-on-write semantics: rows whose
        ``key_cols`` match a row of ``keys`` are removed; ``replacement``
        rows (if any) are added; everything lands in ONE atomic commit.

        File skipping is the point at scale: only files that COULD hold
        a matching row (per ``partition_filter`` / ``stats_filter``
        against the manifest) are read and rewritten — every other file
        is carried into the new snapshot by reference, so the rewrite
        cost is O(affected files), not O(table). Prior snapshots still
        reference the old files (time travel across the delete works
        until :meth:`expire_snapshots`).

        Returns (snapshot_id, files_rewritten, files_untouched).
        """
        snap = self._snapshot(name, None)
        cand, untouched = [], []
        for f in snap["files"]:
            skip = (
                partition_filter is not None
                and not partition_filter(f["partition"])
            ) or (
                stats_filter is not None
                and f.get("stats")
                and not stats_filter(f["stats"])
            )
            (untouched if skip else cand).append(f)
        parts: list[DataFrame] = []
        if cand:
            # apply outstanding equality deletes while reading the
            # rewrite candidates — a rewrite must not resurrect
            # MOR-deleted rows into its (newer-sequence) output files
            parts.append(
                self._df_for_files(
                    spark, name, cand, snap.get("deletes")
                ).join(keys, list(key_cols), "left_anti")
            )
        if replacement is not None:
            parts.append(replacement)
        if not parts:
            return self._snapshot(name, None)["id"], 0, len(untouched)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        new = self._write_data(name, df, partition_by, stats_cols, options)
        sid = self._commit(
            name, untouched + new, "replace", df.schema.json(),
            deletes=self._applicable_deletes(snap.get("deletes"), untouched),
        )
        return sid, len(cand), len(untouched)

    # -- maintenance -----------------------------------------------------
    def compact(
        self,
        spark: SparkSession,
        name: str,
        partition_by: tuple[str, ...] = (),
        target_file_bytes: int = 128 << 20,
        min_files: int = 2,
        stats_cols: tuple[str, ...] = (),
        sort_by: tuple[str, ...] = (),
    ) -> int | None:
        """Bin-pack small-file compaction — Iceberg's
        ``rewrite_data_files``. Long-running append cycles (the
        streaming ingest and the file-incremental pipeline both commit
        per cycle) accrete many small parquet files per partition; at
        100 TB that multiplies scan-planning and open() cost. This
        rewrites every partition holding ≥ ``min_files`` files into
        ~``target_file_bytes`` files and commits a ``rewrite`` snapshot
        referencing the new files plus the untouched ones.

        ``sort_by`` makes it a SORT-based rewrite (Iceberg's
        ``rewrite_data_files(strategy => 'sort')``): rows are
        range-partitioned + sorted on the given columns before the
        write, so each output file covers a narrow, non-overlapping
        value range — which turns the manifest min/max ``stats_cols``
        into an effective file-skipping index (a point/range
        ``stats_filter`` then opens O(matching range) files instead of
        all of them). Appends arrive unsorted; periodic sorted
        compaction is how the read path earns pruning without paying a
        global sort on every write. With ``min_files=1`` every
        partition is re-clustered even if already compacted.

        Logically lossless: rows are identical before and after (test
        asserts set equality), and prior snapshots still reference the
        old files — time travel across the compaction keeps working
        until :meth:`expire_snapshots` reclaims them.

        Returns the new snapshot id, or None if nothing needed rewriting.
        """
        import math

        snap = self._snapshot(name, None)
        groups: dict[tuple, list[dict]] = {}
        for f in snap["files"]:
            groups.setdefault(tuple(sorted(f["partition"].items())), []).append(f)
        todo = [fs for fs in groups.values() if len(fs) >= min_files]
        if not todo:
            return None
        rewrite = [f for fs in todo for f in fs]
        data = self._data(name)
        total = sum(
            os.path.getsize(os.path.join(data, f["path"])) for f in rewrite
        )
        # materialize outstanding equality deletes into the rewrite
        df = self._df_for_files(spark, name, rewrite, snap.get("deletes"))
        n = max(1, math.ceil(total / target_file_bytes))
        # partitioned tables: bound files PER partition dir; unpartitioned:
        # bound total output files
        if sort_by:
            keys = [*partition_by, *sort_by]
            df = df.repartitionByRange(n, *keys).sortWithinPartitions(*keys)
        elif partition_by:
            df = df.repartition(n, *partition_by)
        else:
            df = df.repartition(n)
        new = self._write_data(name, df, partition_by, stats_cols)
        rewritten = {f["path"] for f in rewrite}
        kept = [f for f in snap["files"] if f["path"] not in rewritten]
        return self._commit(
            name, kept + new, "rewrite", df.schema.json(),
            deletes=self._applicable_deletes(snap.get("deletes"), kept),
        )

    def zorder_compact(
        self,
        spark: SparkSession,
        name: str,
        zorder_by: tuple[str, str],
        partition_by: tuple[str, ...] = (),
        target_file_bytes: int = 128 << 20,
        min_files: int = 1,
        stats_cols: tuple[str, ...] = (),
    ) -> int | None:
        """Z-ORDER rewrite — Databricks ``OPTIMIZE ... ZORDER BY`` /
        Iceberg's z-order `rewrite_data_files` strategy for TWO-column
        clustering: a linear sort gives perfect pruning on its leading
        column and none on the second; bit-interleaving both columns'
        grid positions into one key makes every file cover a small
        RECTANGLE of the (a, b) value space, so min/max stats prune on
        BOTH dimensions (asserted against the linear sort in pytest).

        Each column is normalized to a 16-bit grid against its observed
        min/max (one tiny scalar aggregate), then the 32-bit Morton key
        is pure codegen (32 shift/mask terms); the rewrite itself is
        :meth:`compact`'s range-partition+sort on the derived key.
        """
        a, b = zorder_by
        snap = self._snapshot(name, None)
        if len(snap["files"]) < min_files:
            return None
        # full rewrite: materialize equality deletes, commit delete-free
        df = self._df_for_files(spark, name, snap["files"], snap.get("deletes"))
        lo_a, hi_a, lo_b, hi_b = df.agg(
            F.min(a), F.max(a), F.min(b), F.max(b)
        ).collect()[0]
        grid = 0xFFFF

        def g(col: str, lo, hi) -> F.Column:
            span = int(hi) - int(lo)
            if span <= 0:
                return F.lit(0).cast("long")
            return (
                (F.col(col).cast("long") - F.lit(int(lo))) * grid / span
            ).cast("long")
        ga, gb = g(a, lo_a, hi_a), g(b, lo_b, hi_b)
        zkey = F.lit(0).cast("long")
        for i in range(16):
            bit_a = F.shiftright(ga, i).bitwiseAND(F.lit(1))
            bit_b = F.shiftright(gb, i).bitwiseAND(F.lit(1))
            zkey = (
                zkey
                + F.shiftleft(bit_a, 2 * i + 1)
                + F.shiftleft(bit_b, 2 * i)
            )
        import math

        data = self._data(name)
        total = sum(
            os.path.getsize(os.path.join(data, f["path"]))
            for f in snap["files"]
        )
        n = max(1, math.ceil(total / target_file_bytes))
        out = (
            df.withColumn("_zkey", zkey)
            .repartitionByRange(n, *partition_by, "_zkey")
            .sortWithinPartitions(*partition_by, "_zkey")
            .drop("_zkey")
        )
        new = self._write_data(name, out, partition_by, stats_cols)
        return self._commit(name, new, "rewrite", out.schema.json())

    def expire_snapshots(
        self,
        name: str,
        keep_last: int = 1,
        older_than_s: float | None = None,
    ) -> int:
        """Expire all but the newest ``keep_last`` snapshots and delete
        data files no longer referenced by any retained snapshot —
        Iceberg's ``expire_snapshots`` maintenance. Returns the number
        of data files deleted. The log rewrite is the same atomic
        tmp+``os.replace`` as a commit; file deletion happens only
        AFTER the new log is durable (a crash in between leaves
        harmless orphans, never a broken snapshot).

        ``older_than_s`` (Iceberg's ``older_than``, as an age in
        seconds): when set, only snapshots committed more than this
        many seconds ago are ELIGIBLE to expire — newer ones are
        retained in addition to the ``keep_last`` newest, so the two
        criteria compose exactly like Iceberg's (retain_last AND
        older_than). Snapshots from before commit timestamps were
        recorded (no ``ts``) count as infinitely old."""
        import time

        if keep_last < 1:
            # keep_last=0 would slice to the FULL list ([-0:]) and
            # expire nothing — reject instead of silently no-opping
            raise ValueError("expire_snapshots: keep_last must be >= 1")
        if older_than_s is not None and older_than_s < 0:
            raise ValueError("expire_snapshots: older_than_s must be >= 0")
        log = self._read_log(name)
        if len(log["snapshots"]) <= keep_last:
            return 0
        # retained = newest keep_last, plus the published current (it
        # may not be the list tail when staged snapshots exist) and
        # every tagged snapshot — refs pin history, as in Iceberg
        keep_ids = {s["id"] for s in log["snapshots"][-keep_last:]}
        if older_than_s is not None:
            cutoff = time.time() - older_than_s
            keep_ids.update(
                s["id"]
                for s in log["snapshots"]
                if float(s.get("ts", 0.0)) > cutoff
            )
        keep_ids.add(log["current"])
        keep_ids.update(log.get("refs", {}).values())
        # a live branch pins its WHOLE staged lineage (head + every
        # staged ancestor — the branch's own commits), not just the
        # head: intermediates stay readable by id until drop_branch.
        # The walk stops at the first published ancestor, so main
        # history is not pinned through a branch.
        by_id = {s["id"]: s for s in log["snapshots"]}
        for head in log.get("branches", {}).values():
            sid = head
            while sid in by_id:
                keep_ids.add(sid)
                if not by_id[sid].get("staged"):
                    break
                sid = by_id[sid].get("parent", 0)
        kept_snaps = [s for s in log["snapshots"] if s["id"] in keep_ids]
        if len(kept_snaps) == len(log["snapshots"]):
            return 0

        def _paths(s: dict) -> set[str]:
            return {f["path"] for f in s["files"]} | {
                p for d in s.get("deletes") or [] for p in d["paths"]
            }

        live = {p for s in kept_snaps for p in _paths(s)}
        dead = {
            p
            for s in log["snapshots"]
            if s["id"] not in keep_ids
            for p in _paths(s)
        } - live
        log["snapshots"] = kept_snaps
        self._write_log(name, log)
        data = self._data(name)
        for rel in sorted(dead):
            try:
                os.remove(os.path.join(data, rel))
            except FileNotFoundError:
                pass
        # drop now-empty commit dirs (cosmetic)
        for d in sorted(glob.glob(os.path.join(data, "[sd]*")), reverse=True):
            for sub, _, names in list(os.walk(d, topdown=False)):
                if not names and not os.listdir(sub):
                    os.rmdir(sub)
        return len(dead)

    def remove_orphan_files(
        self,
        name: str,
        older_than_s: float = 3 * 86400,
        dry_run: bool = False,
    ) -> list[str]:
        """Delete files under the table's data directory referenced by
        NO snapshot in the log — Iceberg's ``remove_orphan_files``
        maintenance.

        Orphans are created BY DESIGN here, not only by crashes: a
        gated commit that aborts (pipeline validation failure — see
        ``append(gate=...)``) leaves its already-written data files
        with no referencing snapshot, a crash between the data write
        and the atomic log replace does the same, and Spark drops
        ``_SUCCESS`` markers the manifest never tracks. None of these
        affect reads (readers see only manifest-listed files), but at
        10^12-row scale abandoned encode outputs are real storage.

        Safety: only files whose mtime is older than ``older_than_s``
        are swept (default 3 days, mirroring Iceberg's
        ``older_than``), so the data files of a commit that is
        IN FLIGHT right now — written, gate still running, manifest
        not yet replaced — are never deleted from under it.

        Returns the (relative) paths removed — or, with ``dry_run``,
        the paths that WOULD be removed.
        """
        import time

        if older_than_s < 0:
            raise ValueError("remove_orphan_files: older_than_s must be >= 0")
        log = self._read_log(name)
        live = {f["path"] for s in log["snapshots"] for f in s["files"]} | {
            p
            for s in log["snapshots"]
            for d in s.get("deletes") or []
            for p in d["paths"]
        }
        data = self._data(name)
        cutoff = time.time() - older_than_s
        doomed: list[str] = []
        for path in glob.glob(os.path.join(data, "**"), recursive=True):
            if not os.path.isfile(path):
                continue
            rel = os.path.relpath(path, data)
            if rel in live:
                continue
            try:
                if os.path.getmtime(path) > cutoff:
                    continue  # possibly an in-flight commit's file
            except FileNotFoundError:
                continue
            doomed.append(rel)
        if not dry_run:
            for rel in sorted(doomed):
                try:
                    os.remove(os.path.join(data, rel))
                except FileNotFoundError:
                    pass
            for d in sorted(glob.glob(os.path.join(data, "[sd]*")), reverse=True):
                for sub, _, names in list(os.walk(d, topdown=False)):
                    if not names and not os.listdir(sub):
                        os.rmdir(sub)
        return sorted(doomed)
