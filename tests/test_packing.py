from __future__ import annotations

from pyspark.sql import functions as F

from pyreshaper_spark.operators.packing import pack_assign, pack_stats


def _seq(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, source string, n_tok int"
    )


def test_pack_offsets_are_contiguous_per_source(spark):
    rows = [(f"d{i}", "s0" if i % 2 else "s1", 10 + i) for i in range(40)]
    out = pack_assign(_seq(spark, rows), 64).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    for src, docs in by_src.items():
        docs.sort(key=lambda r: r["tok_offset"])
        pos = 0
        for r in docs:
            assert r["tok_offset"] == pos  # no gaps, no overlaps
            assert r["pack_id"] == pos // 64
            end = pos + r["n_tok"] - 1
            assert r["n_span"] == end // 64 - pos // 64 + 1
            pos += r["n_tok"]


def test_pack_order_is_deterministic_and_layout_independent(spark):
    rows = [(f"d{i}", "s0", 7) for i in range(30)]
    a = pack_assign(_seq(spark, rows), 32).collect()
    b = pack_assign(
        _seq(spark, list(reversed(rows))).repartition(7), 32
    ).collect()
    key = lambda r: (r["doc_id"], r["tok_offset"], r["pack_id"])
    assert sorted(map(key, a)) == sorted(map(key, b))


def test_pack_stats_totals(spark):
    rows = [(f"d{i}", "s0", 100) for i in range(10)]  # 1000 tokens
    st = pack_stats(_seq(spark, rows), 256).collect()
    assert sum(r["n_docs_start"] for r in st) == 10
    assert sum(r["toks_started"] for r in st) == 1000
    # 1000 tokens fill packs 0..3; starts can only land in those
    assert {r["pack_id"] for r in st} <= {0, 1, 2, 3}
