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


#: decoder registry: name → callable(payload: bytes, media_type: str)
#: → np.ndarray of uint8 samples. A real codec (PIL / soundfile /
#: ffmpeg) drops in via ``register_decoder`` without touching the
#: pipeline; the feature extractor resolves the decoder ON THE DRIVER
#: and ships the callable inside the mapInPandas closure, so runtime
#: registrations work on executors too (module-level registry state is
#: NOT replicated to Python workers by itself).
Decoder = "Callable[[bytes, str], np.ndarray]"
DECODERS: dict[str, object] = {}


def register_decoder(name: str, fn) -> None:
    DECODERS[name] = fn


def _fake_decode(payload: bytes, media_type: str) -> np.ndarray:
    """Deterministic stand-in: payload bytes as uint8 'samples'."""
    return np.frombuffer(payload, dtype=np.uint8)


def _real_decode(payload: bytes, media_type: str) -> np.ndarray:
    """Real media decode — import-gated on libraries this container
    does not ship; the registry + closure plumbing is the tested part,
    the codec bodies activate when the libs exist."""
    try:
        if media_type == "image":
            import io

            from PIL import Image  # noqa: F401 — not in this container

            return np.asarray(Image.open(io.BytesIO(payload))).reshape(-1)
        if media_type == "audio":
            import io

            import soundfile  # noqa: F401 — not in this container

            data, _ = soundfile.read(io.BytesIO(payload), dtype="int16")
            return np.asarray(data).reshape(-1).view(np.uint8)
    except ImportError:
        pass
    raise NotImplementedError(
        f"real {media_type} decoding requires media libraries not "
        "present in this environment; use the 'fake' decoder or "
        "register_decoder() a custom one"
    )


register_decoder("fake", _fake_decode)
register_decoder("real", _real_decode)


def decode_media(payload: bytes, media_type: str, fake: bool = False) -> np.ndarray:
    """Decode one media payload to a sample array via the registry."""
    return DECODERS["fake" if fake else "real"](payload, media_type)


def _extract_batches(decode):
    """mapInPandas worker factory: vectorized byte-stats + fixed-width
    feature vector per media row, using the given decoder callable.
    Batch shape: whatever Arrow hands us — the loop is per-ROW over the
    batch only for the ragged payload column, all math inside is numpy."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, sums, mins, maxs, lens = [], [], [], [], []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                arr = decode(payload, mtype)
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

    return gen


def extract_features(media: DataFrame, decoder="fake") -> DataFrame:
    """Vectorized feature extraction over media payloads (mapInPandas).

    ``decoder`` is a registry name or a callable; it is resolved here
    (driver side) and serialized into the worker closure."""
    fn = decoder if callable(decoder) else DECODERS[decoder]
    return media.mapInPandas(_extract_batches(fn), schema=FEATURE_SCHEMA)


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


# --------------------------------------------------------------------------
# frame sampling + resize — the video/image halves of the brief's
# decode / feature-extract / resize / frame-sample quartet
# --------------------------------------------------------------------------

def sample_frames_planar(media: DataFrame, every_k: int = 4) -> DataFrame:
    """Frame sampling for FIXED-SIZE planes, entirely JVM-side: when a
    video payload is raw width×height byte planes back to back (the
    synthetic table's convention, and the shape of decoded raw video),
    sampling every k-th frame needs NO Python at all — frame count and
    offsets are arithmetic, the frame is a binary ``substring``, and
    the whole operator stays in whole-stage codegen. One row per
    sampled frame: (doc_id, frame_idx, width, height, frame_md5).

    The md5 is emitted instead of the frame bytes so the result is
    oracle-hashable; production would emit the slice itself (same
    plan, one expression less). Ragged/compressed codecs need the
    decoder path (:func:`sample_frames`) — which this operator
    cross-checks in pytest.
    """
    plane = (F.col("width") * F.col("height")).cast("long")
    n_frames = (F.length("payload").cast("long") / plane).cast("long")
    idx = F.when(
        n_frames > 0,
        F.sequence(F.lit(0).cast("long"), n_frames - 1, F.lit(every_k)),
    ).otherwise(F.expr("array()").cast("array<long>"))
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "doc_id",
            "width",
            "height",
            "payload",
            plane.alias("plane"),
            F.explode(idx).alias("frame_idx"),
        )
        .select(
            "doc_id",
            "frame_idx",
            "width",
            "height",
            F.md5(
                F.expr("substring(payload, frame_idx * plane + 1, plane)")
            ).alias("frame_md5"),
        )
    )


def sample_frames_planar_sql(
    every_k: int = 4,
    width_sql: str = "(n_chars % 64) + 16",
    height_sql: str = "(n_chars % 48) + 16",
) -> str:
    """DuckDB twin over the synthetic media table (payload = UTF-8 of
    ``text``; the fixture is ASCII-only so VARCHAR substr ≡ binary
    substring and md5(VARCHAR) hashes the same bytes — asserted in
    pytest). ``width_sql``/``height_sql`` must mirror whatever the
    Spark side put in the media relation's width/height columns."""
    return f"""
SELECT doc_id, frame_idx, width, height,
       md5(substr(text, CAST(frame_idx * plane + 1 AS BIGINT),
                  CAST(plane AS BIGINT))) AS frame_md5
FROM (
  SELECT doc_id, text,
         CAST({width_sql} AS INT) AS width,
         CAST({height_sql} AS INT) AS height,
         CAST(({width_sql}) * ({height_sql}) AS BIGINT) AS plane,
         unnest(generate_series(0,
           CAST(length(text) // (({width_sql}) * ({height_sql}))
                AS BIGINT) - 1,
           {every_k})) AS frame_idx
  FROM documents
  WHERE doc_id % 3 = 2
)
"""


def sample_frames(
    media: DataFrame, every_k: int = 4, decoder="fake"
) -> DataFrame:
    """Decoder-path frame sampling (mapInPandas, row-EXPANDING batch
    shape): decode each video payload, slice it into width×height
    planes, keep every k-th. This is the path real codecs plug into
    via ``register_decoder`` (a real decoder returns the decoded
    sample buffer; the plane slicing below is unchanged). On the fake
    decoder it must agree frame-for-frame with
    :func:`sample_frames_planar` — the pytest parity gate."""
    fn = decoder if callable(decoder) else DECODERS[decoder]

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_doc, out_idx, out_w, out_h, out_frame = [], [], [], [], []
            for doc, mt, payload, w, h in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"],
                pdf["width"], pdf["height"],
            ):
                if mt != "video":
                    continue
                arr = fn(payload, mt)
                plane = int(w) * int(h)
                n = arr.size // plane if plane else 0
                for i in range(0, n, every_k):
                    out_doc.append(doc)
                    out_idx.append(i)
                    out_w.append(int(w))
                    out_h.append(int(h))
                    out_frame.append(
                        arr[i * plane : (i + 1) * plane].tobytes()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int64"),
                    "width": pd.Series(out_w, dtype="int32"),
                    "height": pd.Series(out_h, dtype="int32"),
                    "frame": pd.Series(out_frame, dtype=object),
                }
            )

    return media.mapInPandas(
        gen,
        "doc_id long, frame_idx long, width int, height int, frame binary",
    )


def resize_media(
    media: DataFrame, out_w: int, out_h: int, decoder="fake"
) -> DataFrame:
    """Nearest-neighbor resize of each image/video-first-frame to
    (out_w, out_h) — the preprocessing step before a vision encoder.
    Vectorized: the decode is per row (ragged), but the resample is a
    single numpy fancy-index gather; no Python pixel loops. Output
    (doc_id, media_type, out_w, out_h, resized binary, px_sum)."""
    fn = decoder if callable(decoder) else DECODERS[decoder]

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # precomputable per (w, h): the gather index grid
        grids: dict[tuple[int, int], np.ndarray] = {}
        for pdf in it:
            docs, mts, blobs, sums = [], [], [], []
            for doc, mt, payload, w, h in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"],
                pdf["width"], pdf["height"],
            ):
                if mt == "audio":
                    continue
                w, h = int(w), int(h)
                plane = w * h
                arr = fn(payload, mt)
                if arr.size < plane:  # pad short payloads (fake decode)
                    arr = np.pad(arr, (0, plane - arr.size))
                img = arr[:plane].reshape(h, w)
                g = grids.get((w, h))
                if g is None:
                    ys = (np.arange(out_h) * h) // out_h
                    xs = (np.arange(out_w) * w) // out_w
                    g = grids[(w, h)] = (ys[:, None], xs[None, :])
                small = img[g]
                docs.append(doc)
                mts.append(mt)
                blobs.append(small.tobytes())
                sums.append(int(small.sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(docs, dtype="int64"),
                    "media_type": pd.Series(mts, dtype=object),
                    "out_w": pd.Series([out_w] * len(docs), dtype="int32"),
                    "out_h": pd.Series([out_h] * len(docs), dtype="int32"),
                    "resized": pd.Series(blobs, dtype=object),
                    "px_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return media.mapInPandas(
        gen,
        "doc_id long, media_type string, out_w int, out_h int, "
        "resized binary, px_sum long",
    )


def media_rules() -> list:
    """Release-gate DQ suite for the multimodal table — the binary
    payload's contracts (typed meta consistent with the payload and
    the modality) expressed in the generic declarative engine
    (operators.checks): identity, modality set, payload presence and
    non-emptiness (byte length — octet_length on the BLOB side),
    plausible plane dims, and the audio-only sample-rate invariant."""
    from pyreshaper_spark.operators.checks import (
        bounds,
        expr_rule,
        in_set,
        not_null,
        unique,
    )

    return [
        not_null("doc_id"),
        unique("doc_id"),
        in_set("media_type", list(MEDIA_TYPES)),
        not_null("payload"),
        expr_rule(
            "payload_nonempty",
            lambda: F.col("payload").isNotNull()
            & (F.length("payload") < 1),
            "payload IS NOT NULL AND octet_length(payload) < 1",
        ),
        bounds("width", lo=16, hi=79),
        bounds("height", lo=16, hi=63),
        expr_rule(
            "audio_rate_consistent",
            lambda: (
                (F.col("media_type") == "audio")
                & (F.col("sample_rate") != 16000)
            )
            | (
                (F.col("media_type") != "audio")
                & (F.col("sample_rate") != 0)
            ),
            "(media_type = 'audio' AND sample_rate != 16000) OR "
            "(media_type != 'audio' AND sample_rate != 0)",
        ),
    ]


def dq_media(docs: DataFrame) -> DataFrame:
    """`dq_media` query entry: the suite over the synthesized table."""
    from pyreshaper_spark.operators.checks import check_suite

    return check_suite(media_table(docs), media_rules())


def dq_media_sql() -> str:
    from pyreshaper_spark.operators.checks import check_suite_sql

    types = ", ".join(f"'{t}'" for t in MEDIA_TYPES)
    return (
        f"""WITH media AS (
  SELECT doc_id,
         ([{types}])[(doc_id % 3) + 1] AS media_type,
         encode(text)                  AS payload,
         CAST((n_chars % 64) + 16 AS INT) AS width,
         CAST((n_chars % 48) + 16 AS INT) AS height,
         CAST(CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 0 END AS INT)
           AS sample_rate
  FROM documents
),
"""
        + check_suite_sql("media", media_rules())
    )
