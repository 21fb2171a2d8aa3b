"""Gorilla-style time-series codec: delta-of-delta timestamps + XOR values.

The graft's analog of the reference's ``netcdf4c`` deflate compression
[U: specification.py :: compression_level]: per-series payload
compression, applied inside the Arrow encode stage (operators.encode).

Scheme (after Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory
Time Series Database", VLDB 2015), with a STREAM-SPLIT layout:

* **Timestamps** (int64 seconds): store ``ts[0]`` raw; encode
  ``dod[i] = (ts[i]-ts[i-1]) - (ts[i-1]-ts[i-2])`` (the first delta is
  a DoD against 0) in the paper's width buckets::

      dod == 0            → bitmap bit 0 (1 bit, nothing else)
      [-63, 64]           → sel 0 + 7-bit offset payload
      [-255, 256]         → sel 1 + 9-bit offset payload
      [-2047, 2048]       → sel 2 + 12-bit offset payload
      else                → sel 3 + 64-bit raw payload

  ``ts_payload`` = [nonzero bitmap: n-1 bits] [2-bit selector ×
  nnz] [payloads back-to-back], each stream byte-aligned.

* **Values** (float64 bit patterns): store ``val[0]`` raw; per point,
  ``xor = bits[i] ^ bits[i-1]``::

      xor == 0            → bitmap bit 0
      else                → 5-bit leading-zero count (clamped 31) and
                            6-bit (sigbits-1) in an 11-bit meta field,
                            then the sigbits payload

  ``val_payload`` = [nonzero bitmap] [11-bit meta × nnz] [payloads].

Deviations from the paper, stated plainly:

* No previous-window *reuse* branch — it creates a sequential scan
  dependency; we always emit the explicit window. Costs a few %
  compression, keeps encoding a pure per-point function.
* Control information lives in its own fixed-width streams instead of
  being interleaved with payloads ("structure of arrays"). The bit
  budget is within ±1 bit/point of the interleaved form (zero points
  still cost exactly 1 bit), but BOTH directions become branch-free
  numpy: fixed-width unpacks + cumsum offsets + a word-gather — the
  point-by-point Python bitstream walk this replaced decoded ~0.3M
  pts/s/core; this layout decodes tens of M pts/s/core, which is what
  a 100 TB re-hydration job actually needs.

Pure module — importable and testable without Spark.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

#: nonzero-DoD selector buckets: (payload bits, lo, hi); sel 3 = raw 64
_TS_BUCKETS = ((7, -63, 64), (9, -255, 256), (12, -2047, 2048))
_TS_RAW_BITS = 64
_TS_WIDTHS = np.array([7, 9, 12, 64], dtype=np.int64)
_TS_LOS = np.array([-63, -255, -2047, 0], dtype=np.int64)


@dataclass(frozen=True)
class EncodedSeries:
    """One encoded series chunk (maps 1:1 to encoded-table columns)."""

    n: int
    first_ts: int
    first_val_bits: int  # uint64 bit pattern of the first float64
    ts_payload: bytes
    val_payload: bytes


# ---------------------------------------------------------------------------
# vectorized bit packing
# ---------------------------------------------------------------------------

def _pack_fields(values: np.ndarray, nbits: np.ndarray) -> bytes:
    """Pack variable-width big-endian bitfields into bytes, vectorized.

    ``values[i]`` contributes its low ``nbits[i]`` bits, MSB-first.

    O(#fields), not O(#bits): the output is viewed as big-endian uint64
    words; each field (≤64 bits) lands in at most two adjacent words,
    OR-scattered with ``np.bitwise_or.at``. (The previous per-bit
    repeat/arange expansion was ~20× slower on 1M-point series.)
    """
    values = values.astype(np.uint64, copy=False)
    nbits = nbits.astype(np.int64, copy=False)
    # fields wider than their value need masking off high garbage bits
    mask = np.where(
        nbits >= 64, np.uint64(0xFFFFFFFFFFFFFFFF),
        (np.uint64(1) << nbits.astype(np.uint64)) - np.uint64(1),
    )
    values = values & mask
    total = int(nbits.sum())
    if total == 0:
        return b""
    ends = np.cumsum(nbits)
    starts = ends - nbits
    nwords = (total + 63) // 64
    words = np.zeros(nwords, dtype=np.uint64)

    # zero-width fields contribute nothing — and one sitting exactly at
    # a 64-bit stream boundary would index one word past the end
    nz = nbits > 0
    if not nz.all():
        values, nbits, starts = values[nz], nbits[nz], starts[nz]

    widx = starts >> 6                      # first word each field touches
    bitoff = (starts & 63).astype(np.int64)  # offset within that word
    # right-shift that aligns the field's MSB-first bits inside word widx
    rsh = 64 - bitoff - nbits
    lo_part = rsh < 0  # field spills into word widx+1

    hi_vals = np.where(
        lo_part,
        values >> (-rsh).clip(min=0).astype(np.uint64),
        values << rsh.clip(min=0).astype(np.uint64),
    )
    np.bitwise_or.at(words, widx, hi_vals)
    if lo_part.any():
        spill_shift = (64 + rsh[lo_part]).astype(np.uint64)
        lo_vals = values[lo_part] << spill_shift
        np.bitwise_or.at(words, widx[lo_part] + 1, lo_vals)

    return words.astype(">u8").tobytes()[: (total + 7) // 8]


def _unpack_fields(
    payload: bytes, starts: np.ndarray, nbits: np.ndarray | int
) -> np.ndarray:
    """Inverse of ``_pack_fields``: extract MSB-first bitfields at bit
    offsets ``starts`` with widths ``nbits`` (≤64), fully vectorized.

    Each field lives in a 64-bit window starting at its offset, built
    from (at most) two adjacent big-endian words — one gather, two
    shifts, one OR per field."""
    starts = np.asarray(starts, dtype=np.int64)
    if np.isscalar(nbits):
        nbits = np.full(starts.shape, nbits, dtype=np.int64)
    if starts.size == 0:
        return np.empty(0, dtype=np.uint64)
    pad = (-len(payload)) % 8
    words = np.frombuffer(
        payload + b"\x00" * (pad + 8), dtype=">u8"
    ).astype(np.uint64)
    widx = starts >> 6
    bitoff = (starts & 63).astype(np.uint64)
    hi = words[widx] << bitoff
    lo = np.where(
        bitoff == 0,
        np.uint64(0),
        words[widx + 1] >> ((np.uint64(64) - bitoff) & np.uint64(63)),
    )
    window = hi | lo
    nb = nbits.astype(np.uint64)
    return np.where(
        nb == 0,
        np.uint64(0),
        window >> ((np.uint64(64) - nb) & np.uint64(63)),
    )


def _clz64(x: np.ndarray) -> np.ndarray:
    """Count leading zeros of uint64, vectorized (x == 0 → 64)."""
    out = np.full(x.shape, 64, dtype=np.int64)
    nz = x != 0
    if nz.any():
        # float64 mantissa is 53 bits — split high/low 32 to stay exact
        xs = x[nz]
        hi = (xs >> np.uint64(32)).astype(np.uint32)
        lo = (xs & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        hi_bits = np.zeros(xs.shape, dtype=np.int64)
        hi_nz = hi != 0
        hi_bits[hi_nz] = 32 - (
            np.floor(np.log2(hi[hi_nz].astype(np.float64))).astype(np.int64) + 1
        )
        lo_bits = np.zeros(xs.shape, dtype=np.int64)
        lo_nz = lo != 0
        lo_bits[lo_nz] = 32 - (
            np.floor(np.log2(lo[lo_nz].astype(np.float64))).astype(np.int64) + 1
        )
        out[nz] = np.where(hi_nz, hi_bits, 32 + lo_bits)
    return out


def _ctz64(x: np.ndarray) -> np.ndarray:
    """Count trailing zeros of uint64, vectorized (x == 0 → 64)."""
    out = np.full(x.shape, 64, dtype=np.int64)
    nz = x != 0
    if nz.any():
        xs = x[nz]
        lowbit = xs & (~xs + np.uint64(1))  # isolate lowest set bit
        out[nz] = 63 - _clz64(lowbit)
    return out


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def encode_timestamps(ts: np.ndarray) -> tuple[int, bytes]:
    """Encode int64 timestamps; returns (first_ts, payload)."""
    ts = np.asarray(ts, dtype=np.int64)
    if ts.size == 0:
        return 0, b""
    if np.any(np.diff(ts) < 0):
        raise ValueError("timestamps must be non-decreasing")
    if ts.size == 1:
        return int(ts[0]), b""
    d = np.diff(ts)
    dod = np.empty_like(d)
    dod[0] = d[0]
    dod[1:] = d[1:] - d[:-1]
    m = dod.size

    nz = dod != 0
    # np.packbits is MSB-first per byte — exactly _pack_fields' 1-bit
    # layout, at C memcpy speed
    bitmap = np.packbits(nz).tobytes()

    dnz = dod[nz]
    sel = np.full(dnz.shape, 3, dtype=np.uint64)  # default: raw 64-bit
    for i, (pb, lo, hi) in reversed(list(enumerate(_TS_BUCKETS))):
        sel[(dnz >= lo) & (dnz <= hi)] = i
    # zigzag-free offset encoding: dod - lo ∈ [0, hi-lo] fits the width
    pay = np.where(
        sel == 3,
        dnz.view(np.uint64),
        (dnz - _TS_LOS[sel.astype(np.int64)]).astype(np.uint64),
    )
    sels = _pack_fields(sel, np.full(sel.shape, 2, dtype=np.int64))
    pays = _pack_fields(pay, _TS_WIDTHS[sel.astype(np.int64)])
    return int(ts[0]), bitmap + sels + pays


def encode_values(vals: np.ndarray) -> tuple[int, bytes]:
    """Encode float64 values; returns (first_val_bits, payload)."""
    bits = np.asarray(vals, dtype=np.float64).view(np.uint64)
    if bits.size == 0:
        return 0, b""
    if bits.size == 1:
        return int(bits[0]), b""
    xor = bits[1:] ^ bits[:-1]
    m = xor.size

    nz = xor != 0
    bitmap = np.packbits(nz).tobytes()

    xnz = xor[nz]
    lz = np.minimum(_clz64(xnz), 31)
    tz = _ctz64(xnz)
    sig = np.maximum(64 - lz - tz, 1)  # meaningful bits (≥1 when xor != 0)
    # 11-bit meta field per nonzero point: (lz << 6) | (sig - 1); then
    # the sig-bit payload = xor >> (64 - lz - sig)
    meta = (lz.astype(np.uint64) << np.uint64(6)) | (sig - 1).astype(np.uint64)
    frag = xnz >> (64 - lz - sig).astype(np.uint64)
    metas = _pack_fields(meta, np.full(meta.shape, 11, dtype=np.int64))
    pays = _pack_fields(frag, sig)
    return int(bits[0]), bitmap + metas + pays


def encode_series(ts: np.ndarray, vals: np.ndarray) -> EncodedSeries:
    ts = np.asarray(ts, dtype=np.int64)
    vals = np.asarray(vals, dtype=np.float64)
    if ts.shape != vals.shape:
        raise ValueError("ts and vals must have equal length")
    first_ts, ts_payload = encode_timestamps(ts)
    first_val_bits, val_payload = encode_values(vals)
    return EncodedSeries(
        n=int(ts.size),
        first_ts=first_ts,
        first_val_bits=first_val_bits,
        ts_payload=ts_payload,
        val_payload=val_payload,
    )


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def _unpack_bitmap(payload: bytes, m: int) -> np.ndarray:
    """First ceil(m/8) bytes → bool[m] (MSB-first, _pack_fields order)."""
    nbytes = (m + 7) // 8
    return (
        np.unpackbits(np.frombuffer(payload[:nbytes], dtype=np.uint8))[:m]
        .astype(bool)
    )


def decode_timestamps(n: int, first_ts: int, payload: bytes) -> np.ndarray:
    """Vectorized stream-split decode: bitmap → selector widths →
    cumsum payload offsets → one word-gather; double cumsum restores
    the timestamps. No per-point Python."""
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n == 1:
        return np.array([first_ts], dtype=np.int64)
    m = n - 1
    nz = _unpack_bitmap(payload, m)
    nnz = int(nz.sum())
    bm_bytes = (m + 7) // 8
    sel_bytes = (2 * nnz + 7) // 8
    sel = _unpack_fields(
        payload[bm_bytes : bm_bytes + sel_bytes],
        np.arange(nnz, dtype=np.int64) * 2,
        2,
    ).astype(np.int64)
    widths = _TS_WIDTHS[sel]
    starts = np.cumsum(widths) - widths
    pay = _unpack_fields(payload[bm_bytes + sel_bytes :], starts, widths)
    dod_nz = np.where(
        sel == 3,
        pay.view(np.int64),
        pay.astype(np.int64) + _TS_LOS[sel],
    )
    dod = np.zeros(m, dtype=np.int64)
    dod[nz] = dod_nz
    out = np.empty(n, dtype=np.int64)
    out[0] = first_ts
    out[1:] = first_ts + np.cumsum(np.cumsum(dod))
    return out


def decode_values(n: int, first_val_bits: int, payload: bytes) -> np.ndarray:
    """Vectorized stream-split decode: bitmap → 11-bit meta fields →
    sig-width payload gather; ``bitwise_xor.accumulate`` restores the
    float64 bit patterns. No per-point Python."""
    if n == 0:
        return np.empty(0, dtype=np.float64)
    if n == 1:
        return np.array([first_val_bits], dtype=np.uint64).view(np.float64)
    m = n - 1
    nz = _unpack_bitmap(payload, m)
    nnz = int(nz.sum())
    bm_bytes = (m + 7) // 8
    meta_bytes = (11 * nnz + 7) // 8
    meta = _unpack_fields(
        payload[bm_bytes : bm_bytes + meta_bytes],
        np.arange(nnz, dtype=np.int64) * 11,
        11,
    )
    lz = (meta >> np.uint64(6)).astype(np.int64)
    sig = (meta & np.uint64(63)).astype(np.int64) + 1
    starts = np.cumsum(sig) - sig
    frag = _unpack_fields(payload[bm_bytes + meta_bytes :], starts, sig)
    xor = np.zeros(m, dtype=np.uint64)
    xor[nz] = frag << (64 - lz - sig).astype(np.uint64)
    out = np.empty(n, dtype=np.uint64)
    out[0] = np.uint64(first_val_bits)
    out[1:] = xor
    return np.bitwise_xor.accumulate(out).view(np.float64)


def decode_series(enc: EncodedSeries) -> tuple[np.ndarray, np.ndarray]:
    ts = decode_timestamps(enc.n, enc.first_ts, enc.ts_payload)
    vals = decode_values(enc.n, enc.first_val_bits, enc.val_payload)
    return ts, vals
