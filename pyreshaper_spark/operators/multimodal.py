"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries images/audio/video as
``binary`` columns with a typed metadata struct beside them. This
module makes the Spark-side plumbing real — schema, partition-friendly
layout, Arrow batch shape, vectorized UDF signatures — while the actual
media decoding is STUBBED (the image/audio libraries are not in this
container): ``decode_media`` raises ``NotImplementedError`` unless the
deterministic fake decoder is requested, which derives a reproducible
"pixel" buffer from the payload bytes so the downstream feature
pipeline is fully testable.

The synthetic ``media`` table is derived deterministically from
``documents``: payload = UTF-8 bytes of ``text``, media_type cycles by
doc_id, width/height derived from n_chars — reproducible in DuckDB for
the oracle (see media_meta_sql).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_TYPES = ("image", "audio", "video")

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "width int, height int, sample_rate int"
)

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, byte_sum long, "
    "byte_min int, byte_max int, feat array<float>"
)


def media_table(docs: DataFrame) -> DataFrame:
    """Synthesize the multimodal table from documents (deterministic)."""
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(t) for t in MEDIA_TYPES]),
            (F.pmod("doc_id", F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
        F.col("text").cast("binary").alias("payload"),
        (F.pmod("n_chars", F.lit(64)) + 16).cast("int").alias("width"),
        (F.pmod("n_chars", F.lit(48)) + 16).cast("int").alias("height"),
        F.when(F.pmod("doc_id", F.lit(3)) == 1, F.lit(16000))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("sample_rate"),
    )


def decode_media(payload: bytes, media_type: str, fake: bool = False) -> np.ndarray:
    """Decode one media payload to a sample array.

    REAL decode is intentionally not implemented in this container
    (no PIL/ffmpeg/soundfile); ``fake=True`` gives the deterministic
    stand-in (payload bytes as uint8) so the rest of the pipeline is
    exercised end-to-end with real shapes.
    """
    if not fake:
        raise NotImplementedError(
            f"real {media_type} decoding requires media libraries not "
            "present in this environment; pass fake=True for the "
            "deterministic test decoder"
        )
    return np.frombuffer(payload, dtype=np.uint8)


def _extract_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: vectorized byte-stats + fixed-width feature
    vector per media row. Batch shape: whatever Arrow hands us — the
    loop is per-ROW over the batch only for the ragged payload column,
    all math inside is numpy."""
    for pdf in it:
        feats, sums, mins, maxs, lens = [], [], [], [], []
        for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
            arr = decode_media(payload, mtype, fake=True)
            lens.append(arr.size)
            if arr.size == 0:
                sums.append(0), mins.append(0), maxs.append(0)
                feats.append(np.zeros(8, dtype=np.float32))
                continue
            sums.append(int(arr.sum()))
            mins.append(int(arr.min()))
            maxs.append(int(arr.max()))
            # 8-bin histogram, normalized — the "embedding" stand-in
            hist = np.bincount(arr >> 5, minlength=8).astype(np.float32)
            feats.append(hist / max(arr.size, 1))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": lens,
                "byte_sum": sums,
                "byte_min": mins,
                "byte_max": maxs,
                "feat": feats,
            }
        )


def extract_features(media: DataFrame) -> DataFrame:
    """Vectorized feature extraction over media payloads (mapInPandas)."""
    return media.mapInPandas(_extract_batches, schema=FEATURE_SCHEMA)


def media_meta(docs: DataFrame) -> DataFrame:
    """Oracle-comparable projection: typed metadata + byte length —
    the JVM-only part of the multimodal path (exact integers)."""
    m = media_table(docs)
    return m.select(
        "doc_id",
        "media_type",
        F.length("payload").cast("long").alias("n_bytes"),
        "width",
        "height",
        "sample_rate",
    )


def media_meta_sql() -> str:
    types = ", ".join(f"'{t}'" for t in MEDIA_TYPES)
    return f"""
SELECT doc_id,
       ([{types}])[(doc_id % 3) + 1]             AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST((n_chars % 64) + 16 AS INT)           AS width,
       CAST((n_chars % 48) + 16 AS INT)           AS height,
       CAST(CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 0 END AS INT) AS sample_rate
FROM documents
"""
