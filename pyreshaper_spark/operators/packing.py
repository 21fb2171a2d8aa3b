"""Sequence packing — the context-window layout op of LLM pretraining.

Pretraining consumes a token STREAM: documents are concatenated in a
fixed order and chunked into context windows of ``context_len`` tokens
(docs straddle window boundaries; EOD tokens mark joins). The batch
builder therefore needs, per document: its token offset in the stream,
which window (pack) it starts in, and how many windows it spans —
exactly what :func:`pack_assign` emits.

Determinism: concatenation order is (md5-hash(doc_id), doc_id) within
each source — reproducible across engines, reruns, and cluster sizes
(the same property ``sampling.hash_sample`` keys on), and a uniform
shuffle of the corpus as a free side effect (hash order ≈ random
order), which is what training wants anyway.

Scale shape: ONE window (per-source cumulative sum) over rows already
reduced to (doc_id, n_tok) — the payload never enters the shuffle; the
pack summary is one hash agg. A single global stream (``by=()``) would
serialize into one partition — the per-source stream is the sharded
layout real pipelines use (one stream per shard/source, readers
round-robin shards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyreshaper_spark.functions.xhash import h32, h32_sql


def pack_assign(
    seq: DataFrame, context_len: int, carry_tokens: bool = False
) -> DataFrame:
    """Per-doc stream layout: (doc_id, source, n_tok, tok_offset,
    pack_id, n_span) where ``tok_offset`` is the doc's first-token
    position in its source's concatenated stream, ``pack_id =
    tok_offset DIV context_len`` the window its first token lands in,
    and ``n_span`` how many windows it touches. ``carry_tokens`` keeps
    the token arrays on the output (for :func:`pack_materialize`)."""
    w = (
        Window.partitionBy("source")
        .orderBy(h32(F.col("doc_id").cast("string")), "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.coalesce(F.sum("n_tok").over(w), F.lit(0)).cast("long")
    extra = ["tokens"] if carry_tokens else []
    out = seq.select(
        "doc_id", "source", "n_tok", off.alias("tok_offset"), *extra
    )
    return out.select(
        "*",
        F.expr(f"tok_offset DIV {context_len}").alias("pack_id"),
        (
            F.expr(f"(tok_offset + n_tok - 1) DIV {context_len}")
            - F.expr(f"tok_offset DIV {context_len}")
            + 1
        ).cast("long").alias("n_span"),
    )


def pack_stats(seq: DataFrame, context_len: int) -> DataFrame:
    """Per-(source, pack) summary: docs starting in the window and
    tokens contributed by them — the feed-rate/waste report (the last
    window of each source is the only underfull one by construction)."""
    return (
        pack_assign(seq, context_len)
        .groupBy("source", "pack_id")
        .agg(
            F.count("*").cast("long").alias("n_docs_start"),
            F.sum("n_tok").cast("long").alias("toks_started"),
        )
    )


def pack_assign_sql(context_len: int) -> str:
    """DuckDB twin of :func:`pack_assign` over ``sequences``. Emits a
    final SELECT (append after a complete WITH list)."""
    h = h32_sql("CAST(doc_id AS VARCHAR)")
    return f"""
SELECT doc_id, source, n_tok, tok_offset,
       tok_offset // {context_len} AS pack_id,
       (tok_offset + n_tok - 1) // {context_len}
         - tok_offset // {context_len} + 1 AS n_span
FROM (
  SELECT doc_id, source, n_tok,
         CAST(coalesce(sum(n_tok) OVER (
           PARTITION BY source ORDER BY {h}, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS tok_offset
  FROM sequences
)
"""


def doc_chunks(seq: DataFrame, chunk: int, stride: int) -> DataFrame:
    """RAG / training-window CHUNKING: split every token array into
    overlapping windows of ``chunk`` tokens starting every ``stride``
    tokens — the retrieval-chunking / long-doc-segmentation op that
    precedes embedding or example construction (``pack_assign`` packs
    WHOLE docs into context windows; this SPLITS docs into windows).

    Contract: chunk offsets are 0, stride, 2·stride, … while the
    offset is inside the document; the tail chunk may be shorter than
    ``chunk`` (never empty). Zero-token docs emit nothing.

    Output (doc_id, source, chunk_id, chunk_tokens, chunk_len) —
    ``chunk_id`` dense from 0 in document order.

    Scale shape: pure map-side work — one codegen ``sequence`` +
    ``Generate`` (explode) + ``slice`` per row; NO shuffle, NO join.
    Output mass is bounded by (chunk/stride)× the corpus token mass —
    the overlap factor, chosen by the caller.
    """
    if chunk < 1 or stride < 1:
        raise ValueError("chunk and stride must be >= 1")
    d = seq.select(
        "doc_id", "source", "tokens", F.size("tokens").alias("n")
    ).filter(F.col("n") > 0)
    offs = F.expr(f"sequence(0, ((n - 1) div {stride}) * {stride}, {stride})")
    return (
        d.withColumn("off", F.explode(offs))
        .select(
            "doc_id",
            "source",
            F.expr(f"off div {stride}").cast("long").alias("chunk_id"),
            F.expr(f"slice(tokens, off + 1, {chunk})").alias("chunk_tokens"),
        )
        .withColumn("chunk_len", F.size("chunk_tokens").cast("long"))
    )


def doc_chunks_sql(chunk: int, stride: int) -> str:
    """DuckDB twin of :func:`doc_chunks` over the `seqs(doc_id,
    source, tokens)` CTE. Emits a final SELECT."""
    return f"""
SELECT doc_id, source,
       CAST(o // {stride} AS BIGINT)          AS chunk_id,
       tokens[o + 1 : o + {chunk}]            AS chunk_tokens,
       CAST(len(tokens[o + 1 : o + {chunk}]) AS BIGINT) AS chunk_len
FROM (
  SELECT doc_id, source, tokens,
         unnest(range(0, ((len(tokens) - 1) // {stride}) * {stride} + 1,
                      {stride})) AS o
  FROM seqs WHERE len(tokens) > 0
)
"""


def pack_materialize(seq: DataFrame, context_len: int) -> DataFrame:
    """MATERIALIZE the packed context windows ``pack_assign`` only
    lays out: each per-source window's actual token array, built by
    concatenating (pieces of) documents in stream order — the final
    example-construction step of an LLM data pipeline, document
    spanning included (a doc crossing a window boundary contributes
    its tail to one window and its head to the next).

    Output (source, pack_id, n_pieces, window_tokens, fill): every
    window is exactly ``context_len`` tokens except each source's
    last. Zero-token docs contribute nothing (they hold no stream
    positions either).

    Scale shape: the layout window's single (source) exchange, a
    map-side Generate over each doc's ≤n_span spanned windows, and
    ONE (source, pack_id) regroup of the pieces — the same exchange
    class as the series transpose. No joins beyond the layout.
    """
    L = context_len
    d = pack_assign(seq, L, carry_tokens=True).filter(F.col("n_tok") > 0)
    d = d.withColumn(
        "w",
        F.explode(
            F.expr(f"sequence(pack_id, (tok_offset + n_tok - 1) DIV {L})")
        ),
    )
    start = F.expr(f"greatest(CAST(0 AS BIGINT), w * {L} - tok_offset)")
    stop = F.expr(f"least(n_tok, (w + 1) * {L} - tok_offset)")
    piece = F.slice(
        F.col("tokens"),
        (start + 1).cast("int"),
        (stop - start).cast("int"),
    )
    return (
        d.select(
            "source",
            F.col("w").cast("long").alias("pack_id"),
            "tok_offset",
            piece.alias("piece"),
        )
        .groupBy("source", "pack_id")
        .agg(
            F.count("*").cast("long").alias("n_pieces"),
            F.flatten(
                F.expr(
                    "transform(array_sort(collect_list("
                    "struct(tok_offset, piece))), x -> x.piece)"
                )
            ).alias("window_tokens"),
        )
        .withColumn("fill", F.size("window_tokens").cast("long"))
    )


def pack_materialize_sql(
    context_len: int, relation: str = "sequences"
) -> str:
    """DuckDB twin of :func:`pack_materialize` over ``relation``
    (which must expose doc_id, source, n_tok, tokens — the md5 token
    stream for cross-engine array equality). Emits a final SELECT."""
    L = context_len
    h = h32_sql("CAST(doc_id AS VARCHAR)")
    return f"""
SELECT source, pack_id,
       CAST(count(*) AS BIGINT) AS n_pieces,
       flatten(list(piece ORDER BY tok_offset)) AS window_tokens,
       CAST(len(flatten(list(piece ORDER BY tok_offset))) AS BIGINT)
         AS fill
FROM (
  SELECT source, tok_offset,
         CAST(w AS BIGINT) AS pack_id,
         tokens[CAST(greatest(0, w * {L} - tok_offset) AS BIGINT) + 1 :
                CAST(least(n_tok, (w + 1) * {L} - tok_offset) AS BIGINT)]
           AS piece
  FROM (
    SELECT source, n_tok, tok_offset, tokens,
           unnest(range(tok_offset // {L},
                        (tok_offset + n_tok - 1) // {L} + 1)) AS w
    FROM (
      SELECT doc_id, source, n_tok, tokens,
             CAST(coalesce(sum(n_tok) OVER (
               PARTITION BY source ORDER BY {h}, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS tok_offset
      FROM {relation}
    )
    WHERE n_tok > 0
  )
)
GROUP BY 1, 2
"""
