"""Round-ritual pin: the FULL oracle parity sweep at sf0.1 — ten times
the driver's check scale, the leg that catches value-range artifacts
(decimal→BIGINT casts, overflow discipline) small-sf sweeps cannot.

Deselected by default (pytest.ini adds ``-m "not sweep_sf01"``); the
round ritual runs it explicitly::

    python -m pytest tests/test_sweep_sf01.py -m sweep_sf01 -q

and NOTES_r{N} cites the result on the final tree. Equivalent to
``python tools/oracle_check.py /root/testdata/sf0.1`` (same harness,
same exit criterion: 0 FAIL, 0 LINT)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.sweep_sf01
def test_full_oracle_sweep_sf01(capsys):
    from tools.oracle_check import main as sweep

    sf_dir = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.1")
    old_argv = sys.argv
    sys.argv = ["oracle_check.py", sf_dir]
    try:
        rc = sweep()
    finally:
        sys.argv = old_argv
    out = capsys.readouterr().out
    assert rc == 0, "oracle sweep failures:\n" + "\n".join(
        ln for ln in out.splitlines() if "FAIL" in ln or "LINT" in ln
    )
