"""Plumbing test for scripts/train_probe.py in TRAIN_PROBE_TINY mode.

The probe measures on-chip training throughput (docs/PERF.md training
table); this drives the full script flow at XS geometry on CPU and asserts
every stage reports — the encode+recombination timing, all three
optimizer/remat train-step configs, and the derived end-to-end numbers.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_train_probe_tiny_all_stages():
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)          # drop the axon sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    env["TRAIN_PROBE_TINY"] = "1"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "train_probe.py")],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    assert "get_kl_input:" in out
    for label in ("[adafactor+remat]", "[adamw+remat]", "[adafactor]",
                  "[adamw]"):
        assert f"{label} step:" in out, (label, out)
    assert "FAILED" not in out
    assert "end-to-end step (encode + train):" in out
    assert "examples/s/chip" in out
