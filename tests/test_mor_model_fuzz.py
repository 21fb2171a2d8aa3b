"""Model-based fuzz of the merge-on-read delete semantics.

A python dict (doc_id -> row) is the executable model of the table's
MERGE-ON-READ contract: append upserts nothing (append-only tables can
hold several rows per key — the model tracks a multiset), equality
delete removes every CURRENT row of the key, compaction and
copy-on-write rewrites change bytes but never rows. Random op
sequences must keep `read()` equal to the model at every step — the
interleavings (delete then re-insert then delete, partial compaction
between deletes, COW delete over outstanding MOR deletes) are exactly
where sequence-number bookkeeping breaks first.
"""

from __future__ import annotations

import random
from collections import Counter

import pytest

from pyreshaper_spark.sources.iceberglite import IcebergLite


def _read(cat, spark):
    return Counter(
        (r["doc_id"], r["n_tok"])
        for r in cat.read(spark, "t").select("doc_id", "n_tok").collect()
    )


@pytest.mark.parametrize("seed", [11, 29])
def test_mor_random_interleavings_match_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    cat = IcebergLite(str(tmp_path / f"wh{seed}"))
    model: Counter = Counter()
    nxt = 0

    def _append():
        nonlocal nxt
        rows = []
        for _ in range(rng.randrange(1, 5)):
            # 50%: re-insert a previously seen key (dead or alive)
            if nxt and rng.random() < 0.5:
                k = f"d{rng.randrange(nxt)}"
            else:
                k = f"d{nxt}"
                nxt += 1
            rows.append((k, rng.randrange(1000)))
        cat.append(
            "t",
            spark.createDataFrame(rows, "doc_id string, n_tok long"),
        )
        model.update(rows)

    _append()  # tables must exist before a delete
    ops = ["append", "mor", "mor", "compact", "cow"]
    for step in range(12):
        op = rng.choice(ops)
        if op == "append":
            _append()
        elif op == "mor":
            live = {k for k, _ in model}
            victims = rng.sample(sorted(live), min(2, len(live)))
            # mix in a key that is already dead (no-op delete)
            victims.append(f"d{rng.randrange(nxt)}")
            cat.delete_rows_mor(
                spark, "t",
                spark.createDataFrame(
                    [(v,) for v in set(victims)], "doc_id string"
                ),
                ("doc_id",),
            )
            for k in list(model):
                if k[0] in set(victims):
                    del model[k]
        elif op == "cow":
            live = {k for k, _ in model}
            if not live:
                continue
            victims = set(rng.sample(sorted(live), 1))
            cat.replace_rows(
                spark, "t",
                spark.createDataFrame(
                    [(v,) for v in victims], "doc_id string"
                ),
                ("doc_id",),
            )
            for k in list(model):
                if k[0] in victims:
                    del model[k]
        else:  # compact — must never change rows
            cat.compact(spark, "t", min_files=rng.choice([1, 2]))
        assert _read(cat, spark) == model, f"seed={seed} step={step} op={op}"
