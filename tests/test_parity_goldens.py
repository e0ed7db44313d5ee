"""Auto-running golden parity test.

Skips unless a goldens bundle exists (recorded in the torch reference
environment by tools/record_goldens.py). Point SAFEVLA_GOLDENS at the .npz
or drop it at the repo root as goldens.npz; whenever assets are present the
frozen-encoder conversions are then verified on every test run.
"""

import os

import pytest

_CANDIDATES = [
    os.environ.get("SAFEVLA_GOLDENS", ""),
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "goldens.npz"),
]
GOLDENS = next((p for p in _CANDIDATES if p and os.path.exists(p)), None)


@pytest.mark.skipif(GOLDENS is None, reason="no goldens.npz recorded (needs network/reference env)")
def test_goldens_parity():
    import argparse
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from parity_check import check_goldens

    ok = check_goldens(argparse.Namespace(goldens=GOLDENS, atol=None))
    assert ok, "golden parity check failed (see PASS/FAIL lines above)"
