"""Per-series encode/decode — the reference's output-file write, Spark-first.

The reference writes one contiguous, compressed time-series file per
variable [U: reshaper.py :: convert; netcdf4c deflate]. Here each
(source, salt) series chunk becomes ONE encoded row:

* the (event_s, n_tok) metric stream → Gorilla XOR + delta-of-delta
  (functions.gorilla, vectorized numpy) — the mandated codec;
* the concatenated token stream → 16-bit packing (vocab 50257 < 2^16;
  a fixed-width vectorized pack beats XOR-of-float64 ~4× for id-like
  data — engineering choice, documented deviation);
* per-doc boundaries (doc_id list + n_tok list) kept as array columns
  so the original per-doc token arrays are exactly reconstructable —
  the port-fidelity invariant decodes THROUGH this path.

Lineage (the reference's TimeKeeper/byte-counter analog [U:
timekeeper.py :: TimeKeeper]): every encoded row carries partition id
(``TaskContext``), row count, raw/encoded byte counts and encode wall
time; `plans.pipeline` appends these to the metrics table.

Scale notes: ``applyInPandas`` groups on (source, salt) — the salt
bounds the largest group (AQE does NOT split pandas groups), so
executor memory per task is ~|hot source| / NSALT. The decoder is
``mapInArrow``: batch-in/batch-out, never collects a series.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyreshaper_spark.functions import gorilla as G

ENCODED_SCHEMA = (
    "source string, salt int, n long, "
    "first_ts long, ts_payload binary, "
    "first_val_bits long, val_payload binary, "
    "tok_payload binary, doc_ids array<string>, doc_n_toks array<int>, "
    "raw_bytes long, enc_bytes long, wall_ms double, partition_id int, "
    "input_files array<string>"
)

DECODED_SCHEMA = (
    "source string, salt int, event_s long, n_tok int, "
    "doc_id string, tokens array<int>"
)


def pack_tokens_u16(tokens: np.ndarray) -> bytes:
    """Vectorized 16-bit little-endian pack of a token id stream."""
    if np.any((tokens < 0) | (tokens > 0xFFFF)):
        raise ValueError("token id out of uint16 range")
    return tokens.astype("<u2").tobytes()


def unpack_tokens_u16(payload: bytes) -> np.ndarray:
    return np.frombuffer(payload, dtype="<u2").astype(np.int32)


def _encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
    t0 = time.perf_counter()
    pdf = pdf.sort_values(["event_s", "doc_id"], kind="mergesort")
    ts = pdf["event_s"].to_numpy(np.int64)
    vals = pdf["n_tok"].to_numpy(np.float64)
    enc = G.encode_series(ts, vals)

    tok_stream = (
        np.concatenate([np.asarray(t, dtype=np.int64) for t in pdf["tokens"]])
        if len(pdf)
        else np.empty(0, dtype=np.int64)
    )
    tok_payload = pack_tokens_u16(tok_stream)

    raw_bytes = int(ts.nbytes + vals.nbytes + tok_stream.size * 4)
    enc_bytes = int(
        len(enc.ts_payload) + len(enc.val_payload) + len(tok_payload) + 24
    )
    try:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
    except Exception:
        pid = -1
    wall_ms = (time.perf_counter() - t0) * 1e3
    return pd.DataFrame(
        {
            "source": [pdf["source"].iloc[0]],
            "salt": [int(pdf["salt"].iloc[0])],
            "n": [enc.n],
            "first_ts": [enc.first_ts],
            "ts_payload": [enc.ts_payload],
            "first_val_bits": [enc.first_val_bits],
            "val_payload": [enc.val_payload],
            "tok_payload": [tok_payload],
            "doc_ids": [pdf["doc_id"].tolist()],
            "doc_n_toks": [pdf["n_tok"].astype("int32").tolist()],
            "raw_bytes": [raw_bytes],
            "enc_bytes": [enc_bytes],
            "wall_ms": [wall_ms],
            "partition_id": [pid],
            "input_files": [
                sorted(pdf["input_file"].unique().tolist())
                if "input_file" in pdf.columns
                else []
            ],
        }
    )


def encode_series_table(series: DataFrame) -> DataFrame:
    """Encode the (salted) series layout: one row per (source, salt).

    Input: output of operators.transpose.transpose_to_series — columns
    doc_id, tokens, n_tok, source, event_s, salt.
    """
    return series.groupBy("source", "salt").applyInPandas(
        _encode_group, schema=ENCODED_SCHEMA
    )


def _decode_batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for batch in it:
        cols = batch.to_pydict()
        out: dict[str, list] = {
            "source": [],
            "salt": [],
            "event_s": [],
            "n_tok": [],
            "doc_id": [],
            "tokens": [],
        }
        for i in range(batch.num_rows):
            enc = G.EncodedSeries(
                n=cols["n"][i],
                first_ts=cols["first_ts"][i],
                first_val_bits=cols["first_val_bits"][i],
                ts_payload=cols["ts_payload"][i],
                val_payload=cols["val_payload"][i],
            )
            ts, vals = G.decode_series(enc)
            toks = unpack_tokens_u16(cols["tok_payload"][i])
            n_toks = np.asarray(cols["doc_n_toks"][i], dtype=np.int64)
            bounds = np.concatenate([[0], np.cumsum(n_toks)])
            out["source"].extend([cols["source"][i]] * enc.n)
            out["salt"].extend([cols["salt"][i]] * enc.n)
            out["event_s"].extend(ts.tolist())
            out["n_tok"].extend(vals.astype(np.int64).tolist())
            out["doc_id"].extend(cols["doc_ids"][i])
            out["tokens"].extend(
                toks[bounds[j] : bounds[j + 1]].tolist() for j in range(enc.n)
            )
        yield pa.RecordBatch.from_pydict(
            {
                "source": pa.array(out["source"], pa.string()),
                "salt": pa.array(out["salt"], pa.int32()),
                "event_s": pa.array(out["event_s"], pa.int64()),
                "n_tok": pa.array(out["n_tok"], pa.int32()),
                "doc_id": pa.array(out["doc_id"], pa.string()),
                "tokens": pa.array(out["tokens"], pa.list_(pa.int32())),
            }
        )


def decode_series_table(encoded: DataFrame) -> DataFrame:
    """Inverse of encode_series_table: explode encoded chunks back to
    per-doc rows (used by the fidelity invariant + tier recompute checks)."""
    return encoded.mapInArrow(_decode_batches, schema=DECODED_SCHEMA)


def compression_report(encoded: DataFrame) -> DataFrame:
    """Aggregate codec effectiveness — the reference's requested-vs-actual
    byte accounting [U: reshaper.py :: byte-count dict]."""
    return encoded.agg(
        F.sum("raw_bytes").alias("raw_bytes"),
        F.sum("enc_bytes").alias("enc_bytes"),
        (F.sum("raw_bytes") / F.sum("enc_bytes")).alias("ratio"),
        F.sum("n").alias("points"),
        F.count("*").alias("chunks"),
    )
