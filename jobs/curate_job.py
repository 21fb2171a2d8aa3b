"""spark-submit entry point for the END-TO-END corpus curation
pipeline — the release flow that turns a raw document dump into a
training-ready, leakage-safe corpus by composing the engine's
training-data operators in the order a real pipeline runs them:

1. exact dedup          (hash-groupBy, keep min doc_id per text)
2. near-dup dedup       (MinHash→LSH→verify → connected components →
                         QUALITY-aware survivors: keep the longest copy)
3. quality filter       (Gopher-style integer heuristics, `ok` flag)
4. per-source quotas    (optional deterministic mixture, hash order)
5. leakage-free split   (train/val/test by near-dup-component hash —
                         no val/test doc has a near-duplicate in train)
6. PII redaction        (span-level typed placeholders)

    spark-submit --py-files /tmp/engine.zip jobs/curate_job.py \
        --docs /data/documents.parquet --out /tmp/curated \
        [--max-df 200] [--val-bp 1000] [--test-bp 1000] \
        [--quota src0=1000 --quota src1=500]

Output: parquet (doc_id, source, split, red_text, n_redacted) plus ONE
JSON metrics line on stdout — per-stage counts that must conserve:
``n_input = n_out + n_null_text + n_exact_dropped + n_near_dropped +
n_quality_dropped + n_quota_dropped`` — the lineage a release audit
reads. Without ``--out`` only the metrics line prints (dry run).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def curate(
    docs: DataFrame,
    max_df: int = 200,
    val_bp: int = 1000,
    test_bp: int = 1000,
    quotas: dict[str, int] | None = None,
    dq_rules: list | None = None,
    dq_strict: bool = False,
) -> tuple[DataFrame, dict]:
    """Run the curation flow; returns (curated DataFrame, metrics).

    Composition notes (why this order):

    * Dedup BEFORE split — `leakage_free_split` needs the near-dup
      pair graph, and splitting a corpus that still contains
      near-duplicates leaks eval data whatever the splitter does.
    * The SAME component labels feed survivor selection and the split
      (computed once, passed to both), so the two decisions can never
      disagree about what is a duplicate.
    * Quotas (mixture) run after cleaning — a quota filled with
      to-be-dropped duplicates under-delivers its source.
    * Redaction last, only over rows actually shipped.

    Metrics conservation (the release-audit identity):
    ``n_input == n_out + n_null_text + n_exact_dropped +
    n_near_dropped + n_quality_dropped + n_quota_dropped``.

    The expensive intermediates (exact survivors, the pair graph, the
    component labels, the shipped set) are persisted for the multiple
    actions this flow takes and unpersisted before returning — the
    output DataFrame depends only on committed lineage.
    """
    from pyreshaper_spark.operators.cluster import (
        connected_components,
        leakage_free_split,
        survivor_flags_pref,
    )
    from pyreshaper_spark.operators.dedup import verified_near_dups
    from pyreshaper_spark.operators.sampling import mix_sources
    from pyreshaper_spark.operators.text import pii_redact, quality_score

    m: dict = {"n_input": docs.count()}

    # -1. optional declarative DQ gate on the RAW input (one extra
    # scan — the whole rule suite is a single aggregate pass). The
    # per-rule results ship in the release metrics either way; strict
    # mode refuses to curate a corpus that breaks a contract, the
    # fail-fast a scheduled release job wants.
    if dq_rules:
        from pyreshaper_spark.operators.checks import check_suite

        dq_rows = check_suite(docs, dq_rules).collect()
        m["dq"] = [
            {
                "rule": r["rule"],
                "violations": r["violations"],
                "passed": r["passed"],
            }
            for r in dq_rows
        ]
        failed = sorted(r["rule"] for r in dq_rows if not r["passed"])
        if dq_strict and failed:
            raise ValueError(f"DQ gate failed: {failed}")

    # 0. NULL text is invalid input, not a duplicate — count it apart
    docs_t = docs.filter(F.col("text").isNotNull())
    m["n_null_text"] = m["n_input"] - docs_t.count()

    cached = []

    def _persist(df: DataFrame) -> DataFrame:
        cached.append(df.persist())
        return df

    # 1. exact dedup: keep the min doc_id per md5(text) — the hash is
    # the join/group key, so the text payload never shuffles
    keep = (
        docs_t.groupBy(F.md5(F.col("text").cast("binary")).alias("k"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    exact_kept = _persist(docs_t.join(keep, "doc_id"))
    m["n_exact_dropped"] = (
        m["n_input"] - m["n_null_text"] - exact_kept.count()
    )

    # 2. near-dup pair graph + components, computed ONCE for both the
    # survivor selection and the split
    pairs = _persist(verified_near_dups(exact_kept, max_df=max_df))
    cc = _persist(connected_components(pairs))
    flags = survivor_flags_pref(exact_kept, pairs, "n_chars", components=cc)
    near_kept = exact_kept.join(
        flags.filter(F.col("kept")).select("doc_id"), "doc_id"
    )
    m["n_near_dropped"] = (
        m["n_input"] - m["n_null_text"] - m["n_exact_dropped"]
        - near_kept.count()
    )

    # 3. quality filter
    qual = (
        quality_score(near_kept).filter(F.col("ok") == 1).select("doc_id")
    )
    qual_kept = near_kept.join(qual, "doc_id")
    n_qual = qual_kept.count()
    m["n_quality_dropped"] = (
        m["n_input"] - m["n_null_text"] - m["n_exact_dropped"]
        - m["n_near_dropped"] - n_qual
    )

    # 4. optional per-source quotas (deterministic hash-order mixture)
    if quotas:
        qual_kept = mix_sources(qual_kept, quotas).drop("mix_rank")
    qual_kept = _persist(qual_kept)
    m["n_quota_dropped"] = n_qual - qual_kept.count()

    # 5. leakage-free split over the SAME component labels
    split = leakage_free_split(
        exact_kept, pairs, val_bp=val_bp, test_bp=test_bp, components=cc
    ).select("doc_id", "split")

    # 6. span-level PII redaction of the shipped rows
    red = pii_redact(qual_kept)

    out = (
        qual_kept.select("doc_id", "source")
        .join(split, "doc_id")
        .join(red, "doc_id")
        .select("doc_id", "source", "split", "red_text", "n_redacted")
    )
    split_counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    m["n_out"] = sum(split_counts.values())
    for s in ("train", "val", "test"):
        m[f"n_{s}"] = split_counts.get(s, 0)
    m["n_docs_redacted"] = out.filter(F.col("n_redacted") > 0).count()
    out = out.localCheckpoint()
    for df in cached:
        df.unpersist()
    return out, m


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True,
                    help="documents parquet (doc_id, text, source, n_chars)")
    ap.add_argument("--out", default=None,
                    help="curated-corpus parquet output path")
    ap.add_argument("--table", default=None, metavar="ROOT::NAME",
                    help="write to an IcebergLite table instead "
                         "(atomic snapshot per release; time travel "
                         "across corpus versions)")
    ap.add_argument("--max-df", type=int, default=200)
    ap.add_argument("--val-bp", type=int, default=1000)
    ap.add_argument("--test-bp", type=int, default=1000)
    ap.add_argument("--quota", action="append", default=[],
                    metavar="SRC=N", help="per-source doc quota (repeat)")
    ap.add_argument("--dq", action="store_true",
                    help="run the documents DQ rule suite on the raw "
                         "input and ship per-rule results in metrics")
    ap.add_argument("--dq-strict", action="store_true",
                    help="with --dq: refuse to release if any "
                         "zero-tolerance rule fails")
    args = ap.parse_args(argv)

    quotas: dict[str, int] = {}
    for spec in args.quota:
        src, _, n = spec.partition("=")
        if not n.isdigit():
            ap.error(f"--quota expects SRC=N, got {spec!r}")
        quotas[src] = int(n)

    from pyreshaper_spark.session import get_spark

    spark = SparkSession.getActiveSession() or get_spark("curate-job")
    docs = spark.read.parquet(args.docs)
    dq_rules = None
    if args.dq or args.dq_strict:
        from pyreshaper_spark.operators.checks import documents_rules

        dq_rules = documents_rules()
    out, metrics = curate(
        docs,
        max_df=args.max_df,
        val_bp=args.val_bp,
        test_bp=args.test_bp,
        quotas=quotas or None,
        dq_rules=dq_rules,
        dq_strict=args.dq_strict,
    )
    if args.out:
        out.write.mode("overwrite").parquet(args.out)
    if args.table:
        root, _, name = args.table.partition("::")
        if not name:
            ap.error("--table expects ROOT::NAME")
        from pyreshaper_spark.sources.catalog import get_catalog

        cat = get_catalog(root)
        # each curation run is ONE atomic release snapshot — readers
        # see the previous corpus until the commit lands, and every
        # past release stays time-travelable
        metrics["snapshot_id"] = cat.overwrite(
            name, out, partition_by=("split",)
        )
    print(json.dumps(metrics, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
