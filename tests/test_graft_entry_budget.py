"""dryrun_multichip budget shedding: the round-5 driver-gate fix.

MULTICHIP_r04 was rc=124 because the 5-leg dryrun had no effective budget
(DRYRUN_BUDGET defaulted to 0=off) and the driver sets no env vars. The
fix: a 600 s default budget, per-leg elapsed prints, and explicit
``skipped (budget):`` lines. This pins the shed path end-to-end: with a
tiny budget the flagship leg still runs (and passes), every later leg is
shed loudly, and the process exits 0 — which is exactly what makes the
driver's MULTICHIP artifact ok=true under any window.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_tiny_budget_sheds_optional_legs_but_exits_zero():
    env = dict(os.environ, DRYRUN_DEVICES="2", DRYRUN_BUDGET="0.001")
    # A fresh process: _force_cpu_devices must run before jax init.
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py")],
        env=env, capture_output=True, text=True, timeout=900, cwd=REPO,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    out = res.stdout
    assert "dryrun_multichip ok:" in out  # flagship leg ran and passed
    assert "[flagship] leg" in out  # per-leg elapsed print
    # Predictive shedding is per leg (legs are independent): all four
    # optional legs shed individually and loudly under a tiny budget.
    assert out.count("skipped (budget):") == 4
    assert "lovasz ok" not in out  # optional legs actually shed
