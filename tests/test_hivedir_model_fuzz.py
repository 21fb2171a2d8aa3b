"""Model-based fuzz of the hive-layout catalog's core write semantics.

A python Counter multiset is the executable model: append adds rows,
overwrite replaces the table, overwrite_partitions replaces exactly
the partitions present in the frame, append_once adds rows exactly
once per key (replays no-op, empty epochs commit nothing). Random op
sequences must keep ``read()`` equal to the model at every step — the
interleavings (partition overwrite after plain append, replayed
once-keys around overwrites, empty-epoch no-ops between real commits)
are where a directory-layout catalog's file bookkeeping breaks first.
"""

from __future__ import annotations

import random
from collections import Counter

import pytest

from pyreshaper_spark.sources.hivedir import HiveDirCatalog

SOURCES = ("s0", "s1", "s2")
SCHEMA = "doc_id string, source string, n_tok long"


def _read(cat, spark):
    return Counter(
        (r["doc_id"], r["source"], r["n_tok"])
        for r in cat.read(spark, "t", allow_empty=True).collect()
    )


def _rows(rng, nxt):
    rows = []
    for _ in range(rng.randrange(1, 4)):
        rows.append(
            (f"d{nxt[0]}", rng.choice(SOURCES), rng.randrange(1000))
        )
        nxt[0] += 1
    return rows


@pytest.mark.parametrize("seed", [7, 23])
def test_hivedir_random_interleavings_match_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    cat = HiveDirCatalog(str(tmp_path / f"wh{seed}"))
    model: Counter = Counter()
    nxt = [0]
    used_keys: list[str] = []

    def _df(rows):
        return spark.createDataFrame(rows, SCHEMA)

    def op_append():
        rows = _rows(rng, nxt)
        cat.append("t", _df(rows), partition_by=("source",))
        model.update(rows)

    def op_overwrite():
        rows = _rows(rng, nxt)
        cat.overwrite("t", _df(rows), partition_by=("source",))
        model.clear()
        model.update(rows)

    def op_overwrite_partitions():
        rows = _rows(rng, nxt)
        cat.overwrite_partitions("t", _df(rows), ("source",))
        touched = {r[1] for r in rows}
        for k in [k for k in model if k[1] in touched]:
            del model[k]
        model.update(rows)

    def op_append_once_new():
        rows = _rows(rng, nxt)
        key = f"epoch:{nxt[0]}"
        used_keys.append(key)
        cat.append_once("t", _df(rows), key=key, partition_by=("source",))
        model.update(rows)

    def op_append_once_replay():
        if not used_keys:
            return
        key = rng.choice(used_keys)
        rows = _rows(rng, nxt)  # different payload, same key → no-op
        cat.append_once("t", _df(rows), key=key, partition_by=("source",))

    def op_append_once_empty():
        key = f"empty:{nxt[0]}"
        cat.append_once(
            "t", _df([]).limit(0), key=key, partition_by=("source",)
        )

    ops = [
        op_append, op_append, op_overwrite, op_overwrite_partitions,
        op_overwrite_partitions, op_append_once_new,
        op_append_once_replay, op_append_once_empty,
    ]
    # seed the table so partitioned reads have shape from step 0
    op_append()
    for step in range(14):
        rng.choice(ops)()
        got = _read(cat, spark)
        assert got == model, f"seed={seed} step={step}: {got} != {model}"
