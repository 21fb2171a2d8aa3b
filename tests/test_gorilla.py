"""Gorilla codec round-trip — pure numpy, no Spark (FIXTURES.md F6).

Edge cases mandated: single-point series, constant values (XOR=0
path), irregular timestamps (DoD != 0), int extremes, negative/special
floats. Exactness bar: bit-equal floats, exact timestamps.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyreshaper_spark.functions import gorilla as G


def roundtrip(ts, vals):
    enc = G.encode_series(np.asarray(ts), np.asarray(vals))
    dts, dvals = G.decode_series(enc)
    np.testing.assert_array_equal(dts, np.asarray(ts, dtype=np.int64))
    assert (
        dvals.view(np.uint64) == np.asarray(vals, np.float64).view(np.uint64)
    ).all()
    return enc


def test_empty_series():
    enc = G.encode_series(np.array([], dtype=np.int64), np.array([]))
    dts, dvals = G.decode_series(enc)
    assert dts.size == 0 and dvals.size == 0


def test_single_point():
    enc = roundtrip([1704067200], [42.0])
    assert enc.ts_payload == b"" and enc.val_payload == b""


def test_regular_cadence_constant_values_compresses_hard():
    n = 5000
    ts = 1704067200 + 60 * np.arange(n, dtype=np.int64)
    vals = np.full(n, 7.0)
    enc = roundtrip(ts, vals)
    # after the first delta, every dod==0 ('0') and every xor==0 ('0'):
    # ~2 bits/point → payloads ≈ n/8 bytes each
    assert len(enc.ts_payload) < n // 3
    assert len(enc.val_payload) <= n // 8 + 8


def test_irregular_timestamps_and_values():
    ts = np.cumsum(np.array([0, 1, 59, 61, 3600, 2, 2, 86400, 1, 12345]))
    ts = (1704067200 + ts).astype(np.int64)
    vals = np.array([1.5, -2.25, 0.0, 0.0, 1e300, -1e-300, 3.14, 3.14, 2.0, 512.0])
    roundtrip(ts, vals)


def test_duplicate_timestamps_allowed_monotonic_required():
    roundtrip([10, 10, 10, 11], [1.0, 2.0, 3.0, 4.0])
    with pytest.raises(ValueError, match="non-decreasing"):
        G.encode_timestamps(np.array([10, 9], dtype=np.int64))


def test_int_extremes_as_values():
    vals = np.array([0, 1, 2**31 - 1, -(2**31), 2**53, 1], dtype=np.float64)
    ts = np.arange(6, dtype=np.int64)
    roundtrip(ts, vals)


def test_special_floats():
    vals = np.array([np.nan, np.inf, -np.inf, -0.0, 0.0, np.nan])
    ts = np.arange(6, dtype=np.int64) * 60
    roundtrip(ts, vals)  # bit-pattern equality handles NaN correctly


def test_large_dod_uses_raw_branch():
    ts = np.array([0, 1, 2, 10**12], dtype=np.int64)  # dod ≈ 1e12 > 2048
    roundtrip(ts, [1.0, 2.0, 3.0, 4.0])


@settings(max_examples=50, deadline=None)
@given(
    deltas=st.lists(st.integers(min_value=0, max_value=10**7), min_size=1, max_size=300),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_property_roundtrip(deltas, seed):
    ts = np.cumsum(np.asarray(deltas, dtype=np.int64)) + 1_700_000_000
    rng = np.random.RandomState(seed)
    kind = seed % 3
    if kind == 0:
        vals = rng.randint(1, 1000, size=len(deltas)).astype(np.float64)
    elif kind == 1:
        vals = rng.randn(len(deltas)) * 10**(seed % 20)
    else:
        vals = np.repeat(rng.randn(1), len(deltas))
    roundtrip(ts, vals)


def test_compression_ratio_on_realistic_series():
    """Minute-cadence counter series should beat raw 16 bytes/point."""
    n = 10_000
    ts = 1704067200 + 60 * np.arange(n, dtype=np.int64)
    rng = np.random.RandomState(7)
    vals = np.round(rng.gamma(4.0, 50.0, n))  # integral token counts
    enc = G.encode_series(ts, vals)
    encoded = len(enc.ts_payload) + len(enc.val_payload) + 24
    assert encoded < 16 * n * 0.6, f"ratio {(16 * n) / encoded:.2f}x too low"


def test_pack_zero_width_field_at_word_boundary():
    """Regression: a zero-width field whose offset lands exactly on a
    64-bit boundary must not scatter past the word array (found at 8M
    rows when a dod==0 control bit closed a 64-bit-aligned stream)."""
    from pyreshaper_spark.functions.gorilla import _pack_fields

    vals = np.array([0xDEADBEEF, 0x0], dtype=np.uint64)
    bits = np.array([64, 0], dtype=np.int64)
    out = _pack_fields(vals, bits)
    assert out == (0xDEADBEEF).to_bytes(8, "big")


def test_roundtrip_large_series_regression():
    """1M-point roundtrip with many dod==0 runs (constant cadence)."""
    ts = np.arange(1_000_000, dtype=np.int64) * 7
    vals = np.repeat(np.arange(1000.0), 1000)
    enc = G.encode_series(ts, vals)
    dts, dvals = G.decode_series(enc)
    assert (dts == ts).all() and (dvals == vals).all()


def test_decode_throughput_vectorized():
    """The stream-split layout decodes ≥1M pts/s/core (the verdict bar;
    measured ~6M on this container) — a re-hydration job must not crawl."""
    import time

    rng = np.random.RandomState(7)
    n = 1_000_000
    ts = 1704067200 + np.cumsum(rng.randint(0, 120, n)).astype(np.int64)
    vals = np.round(rng.gamma(4.0, 50.0, n))
    enc = G.encode_series(ts, vals)
    G.decode_series(enc)  # warm
    # best-of-5: this asserts the CODEC's speed, not the box's load
    # (the full suite runs Spark sessions on every core concurrently)
    dt = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        dts, dvals = G.decode_series(enc)
        dt = min(dt, time.perf_counter() - t0)
    assert (dts == ts).all() and (dvals == vals).all()
    assert n / dt > 1_000_000, f"decode only {n / dt / 1e6:.2f}M pts/s"
