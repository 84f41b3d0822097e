"""Production TrainLoop soak: crash mid-run + Orbax resume, end to end.

VERDICT r3 item 4 — the reference's operating mode (train_util.py:150-221)
is a long run with the loss-aware sampler updating, EMA eval hooks firing,
and checkpoint/kill/resume. scripts/train_soak.py drives the REAL
scripts/train_dit.py CLI through exactly that (SIGKILL mid-run, relaunch
with --resume) and self-validates from run artifacts; this test runs a
small-geometry instance and asserts every check. The committed
multi-thousand-step run lives in docs/soak_r04.json.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_train_soak_crash_resume(tmp_path):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "train_soak.py"),
         "--workdir", str(tmp_path),
         "--total_steps", "60", "--kill_at_step", "30",
         "--save_interval", "20", "--log_interval", "5",
         "--eval_interval", "20", "--phase_timeout", "1800"],
        capture_output=True, text=True, timeout=3600,
    )
    lines = [l for l in proc.stdout.splitlines()
             if l.startswith("SOAK_RESULT ")]
    assert lines, (proc.stdout[-2000:], proc.stderr[-2000:])
    result = json.loads(lines[-1][len("SOAK_RESULT "):])
    assert result["ok"], result
    # every individual invariant, so a failure names the broken property
    for name, passed in result["checks"].items():
        assert passed, (name, result["detail"])
    d = result["detail"]
    assert d["resumed_from"] <= d["killed_at"] < result["total_steps"]
    assert d["loss_last_decile"] < d["loss_first_decile"]
    assert proc.returncode == 0


def _mesh_args(**kw):
    import argparse
    d = dict(dp=0, fsdp=1, tp=1, batch_size=4)
    d.update(kw)
    return argparse.Namespace(**d)


def test_build_mesh_auto_degrades_to_batch_divisor():
    """Round-5 regression: auto mode (no explicit --dp/--fsdp/--tp) must
    accept a global batch that does not divide over all visible devices —
    the soak's 4-excerpt batch on the 8-device virtual mesh was rejected
    by an assert, killing phase 1 before the crash/resume exercise."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import jax
    from train_dit import build_mesh

    assert jax.device_count() == 8
    mesh = build_mesh(_mesh_args(batch_size=4))
    assert mesh is not None and mesh.shape["data"] == 4

    # batch divisible by everything: all devices used
    mesh = build_mesh(_mesh_args(batch_size=16))
    assert mesh.shape["data"] == 8

    # odd batch: data-parallel over the matching divisor prefix
    mesh = build_mesh(_mesh_args(batch_size=3))
    assert mesh.shape["data"] == 3

    # batch of 1: no divisor > 1; fall back to the single-device path
    assert build_mesh(_mesh_args(batch_size=1)) is None

    # explicit request keeps the hard assert
    with pytest.raises(AssertionError):
        build_mesh(_mesh_args(dp=4, fsdp=2, batch_size=4))
