"""Sustained production-TrainLoop soak: train, crash mid-run, resume, validate.

The reference's actual operating mode is a long `TrainLoop.run_loop` with the
loss-aware timestep sampler updating, EMA eval hooks firing, and periodic
checkpoints that a restarted job resumes from (train_util.py:150-221 resume,
:191-221 loop, :222-317 eval).  Unit tests exercise each piece; this harness
exercises the composition the way production does, using the REAL
`scripts/train_dit.py` CLI as subprocesses:

  phase 1  train on a synthetic on-disk dataset (manifest CSVs + uint8 .npy
           rolls, the prepare_data.py format) until a hard SIGKILL at
           --kill_at_step — no atexit, no final save: a genuine crash;
  phase 2  relaunch the same command with --resume True; TrainLoop restores
           the latest Orbax checkpoint and runs to lr_anneal_steps.

Both phases share one logging dir: the CSV sink resume-appends
(utils/logger.py CSVOutputFormat), so progress.csv holds the full history and
the validation reads only run artifacts, not harness state:

  * step continuity — steps increase within each phase; the single
    drop-back at the phase boundary lands exactly on the restored
    checkpoint's step (replayed steps are expected; a reset to 0 fails);
  * the final logged step reaches lr_anneal_steps - 1 and a final
    checkpoint >= the kill step exists with a valid SCHEMA marker;
  * train loss is finite everywhere and decreases (first- vs last-decile
    means over the whole run);
  * eval_* EMA-loss keys (run_step_eval) appear with finite values;
  * eval sampling wrote non-empty samples/iter_*/ MIDI dirs;
  * the loss-second-moment sampler is active throughout (production mode).

Emits one line `SOAK_RESULT {json}` and exits non-zero on any failed check.
Used by tests/test_train_soak.py (small geometry) and for the committed
multi-thousand-step run (docs/soak_r04).
"""

import argparse
import json
import math
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VAE_ARCH = {"ch": 32, "ch_mult": [1, 1, 2, 2], "num_res_blocks": 1}


def build_dataset(workdir: str, n_train: int, n_eval: int, roll_len: int):
    """Synthetic uint8 rolls + manifest CSVs in the prepare_data.py layout."""
    from rule_guided_music_tpu.utils.fixtures import make_rolls

    os.makedirs(os.path.join(workdir, "rolls"), exist_ok=True)
    manifests = {}
    for split, n, seed in (("train", n_train, 0), ("eval", n_eval, 10_000)):
        rolls = make_rolls(n, length=roll_len, seed=seed)
        rows = []
        for i in range(n):
            path = os.path.join(workdir, "rolls", f"{split}_{i}.npy")
            np.save(path, np.clip((rolls[i] + 1.0) * 63.5, 0, 127)
                    .astype(np.uint8))
            rows.append((path, i % 3))          # 3 dataset-label classes
        csv_path = os.path.join(workdir, f"{split}.csv")
        with open(csv_path, "w") as f:
            f.write("midi_filename,classes\n")
            for path, cls in rows:
                f.write(f"{path},{cls}\n")
        manifests[split] = csv_path
    return manifests


def extract_vae(workdir: str) -> "tuple[str, float]":
    """The learned tiny VAE from the committed quality fixture."""
    data = np.load(os.path.join(REPO, "tests", "fixtures", "quality_tiny.npz"))
    out = os.path.join(workdir, "vae.npz")
    np.savez(out, **{k[len("vae/params/"):]: data[k]
                     for k in data.files if k.startswith("vae/params/")})
    return out, float(data["scale_factor"])


def cli_env():
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)              # drop the axon sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, ".jax_cache_cpu")
    return env


def train_cmd(a, manifests, vae_path, scale, resume: bool):
    cmd = [
        sys.executable, os.path.join(REPO, "scripts", "train_dit.py"),
        "--dir", "soak",
        "--data_dir", manifests["train"],
        "--eval_data_dir", manifests["eval"],
        "--model", "DiTRotary_XS_8",
        "--image_size", "128", "16", "--in_channels", "4",
        "--num_classes", "3", "--class_cond", "True",
        "--vae_path", vae_path, "--vae_arch", json.dumps(VAE_ARCH),
        "--scale_factor", str(scale),
        "--pr_image_size", str(a.pr_image_size),
        "--encode_rep", str(a.encode_rep), "--shift_size", "4",
        "--batch_size", str(a.batch_size),
        "--lr", str(a.lr), "--lr_anneal_steps", str(a.total_steps),
        "--schedule_sampler", "loss-second-moment",
        "--log_interval", str(a.log_interval),
        "--save_interval", str(a.save_interval),
        "--eval_interval", str(a.eval_interval),
        "--eval_sample_batch_size", "2",
        "--bf16", "False", "--seed", "0",
    ]
    if resume:
        cmd += ["--resume", "True"]
    return cmd


def read_progress(csv_path: str):
    import pandas as pd

    return pd.read_csv(csv_path)


def run_phase1(a, cmd, workdir, log_path):
    """Run until progress.csv shows step >= kill_at_step, then SIGKILL."""
    progress = os.path.join(workdir, "loggings", "soak", "progress.csv")
    with open(log_path, "w") as log:
        proc = subprocess.Popen(cmd, cwd=workdir, env=cli_env(),
                                stdout=log, stderr=subprocess.STDOUT)
        deadline = time.time() + a.phase_timeout
        killed_at = None
        try:
            while time.time() < deadline:
                if proc.poll() is not None:
                    raise RuntimeError(
                        f"phase 1 exited (rc={proc.returncode}) before the "
                        f"kill step; see {log_path}")
                if os.path.exists(progress):
                    try:
                        df = read_progress(progress)
                        if "step" in df and len(df) and \
                                df["step"].iloc[-1] >= a.kill_at_step:
                            killed_at = int(df["step"].iloc[-1])
                            break
                    except Exception:
                        pass             # mid-write CSV; retry
                time.sleep(0.5)
            if killed_at is None:
                raise RuntimeError("phase 1 never reached the kill step "
                                   f"within {a.phase_timeout}s")
            proc.send_signal(signal.SIGKILL)
            proc.wait(timeout=60)
        finally:
            if proc.poll() is None:
                proc.kill()
    return killed_at


def validate(a, workdir, killed_at):
    import pandas as pd

    root = os.path.join(workdir, "loggings", "soak")
    df = read_progress(os.path.join(root, "progress.csv"))
    checks, detail = {}, {}

    steps = df["step"].dropna().astype(int).to_numpy()
    drops = np.where(np.diff(steps) < 0)[0]
    ckpt_dir = os.path.join(root, "checkpoints")
    ckpts = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("step_"))
    ckpt_steps = [int(d.split("_")[1]) for d in ckpts]
    resumed_from = max(s for s in ckpt_steps if s <= killed_at)
    detail["ckpt_steps"] = ckpt_steps
    detail["resumed_from"] = resumed_from
    detail["killed_at"] = killed_at
    # exactly one drop-back, landing on the restored checkpoint's step
    checks["continuity"] = (
        len(drops) == 1 and int(steps[drops[0] + 1]) == resumed_from
    )
    checks["completion"] = int(steps.max()) >= a.total_steps - a.log_interval
    detail["final_step"] = int(steps.max())

    # final checkpoint with schema marker (run_loop's exit save)
    final_ckpt = os.path.join(ckpt_dir, ckpts[-1])
    schema = open(os.path.join(final_ckpt, "SCHEMA")).read().strip()
    checks["final_checkpoint"] = (
        ckpt_steps[-1] >= killed_at and schema == "rule-guided-music-tpu/v1"
    )

    loss = df["loss"].dropna().astype(float).to_numpy()
    dec = max(len(loss) // 10, 1)
    first, last = float(loss[:dec].mean()), float(loss[-dec:].mean())
    detail["loss_first_decile"] = first
    detail["loss_last_decile"] = last
    checks["loss_finite"] = bool(np.isfinite(loss).all())
    checks["loss_decreasing"] = last < first * a.loss_ratio
    checks["no_skipped_steps"] = (
        "skipped" not in df or
        not df["skipped"].dropna().astype(float).any()
    )

    eval_cols = [c for c in df.columns if c.startswith("eval_")]
    detail["eval_keys"] = eval_cols
    eval_loss = (df["eval_loss"].dropna().astype(float).to_numpy()
                 if "eval_loss" in df else np.array([]))
    checks["eval_loss_logged"] = (
        len(eval_loss) >= 2 and bool(np.isfinite(eval_loss).all())
        and any(c.startswith("eval_loss_q") for c in eval_cols)
    )
    detail["n_eval_rows"] = int(len(eval_loss))

    sample_dirs = []
    samples_root = os.path.join(root, "samples")
    if os.path.isdir(samples_root):
        sample_dirs = sorted(os.listdir(samples_root))
    midis = sum(
        len([f for f in os.listdir(os.path.join(samples_root, d))
             if f.endswith(".midi")])
        for d in sample_dirs
    ) if sample_dirs else 0
    checks["eval_samples_written"] = len(sample_dirs) >= 1 and midis >= 1
    detail["sample_iters"] = sample_dirs
    return checks, detail


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True)
    p.add_argument("--total_steps", type=int, default=2000)
    p.add_argument("--kill_at_step", type=int, default=0,
                   help="0 = 55%% of total_steps")
    p.add_argument("--save_interval", type=int, default=400)
    p.add_argument("--log_interval", type=int, default=10)
    p.add_argument("--eval_interval", type=int, default=200)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--encode_rep", type=int, default=2)
    p.add_argument("--pr_image_size", type=int, default=1536)
    p.add_argument("--n_train", type=int, default=24)
    p.add_argument("--n_eval", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--loss_ratio", type=float, default=0.8,
                   help="pass if last-decile mean < ratio * first-decile")
    p.add_argument("--phase_timeout", type=int, default=5400)
    a = p.parse_args()
    if not a.kill_at_step:
        a.kill_at_step = int(a.total_steps * 0.55)

    os.makedirs(a.workdir, exist_ok=True)
    # stretch window needs raw length >= 1.05 * pr_image_size
    roll_len = int(math.ceil(a.pr_image_size * 1.05 / 128 + 1)) * 128
    manifests = build_dataset(a.workdir, a.n_train, a.n_eval, roll_len)
    vae_path, scale = extract_vae(a.workdir)

    t0 = time.time()
    cmd = train_cmd(a, manifests, vae_path, scale, resume=False)
    print(f"[soak] phase 1: {a.total_steps} steps, SIGKILL at "
          f"~{a.kill_at_step}", flush=True)
    killed_at = run_phase1(a, cmd, a.workdir,
                           os.path.join(a.workdir, "phase1.log"))
    t1 = time.time()
    print(f"[soak] killed at step {killed_at} after {t1 - t0:.0f}s; "
          f"resuming", flush=True)

    cmd = train_cmd(a, manifests, vae_path, scale, resume=True)
    with open(os.path.join(a.workdir, "phase2.log"), "w") as log:
        rc = subprocess.run(cmd, cwd=a.workdir, env=cli_env(), stdout=log,
                            stderr=subprocess.STDOUT,
                            timeout=a.phase_timeout).returncode
    if rc != 0:
        tail = open(os.path.join(a.workdir, "phase2.log")).read()[-3000:]
        raise RuntimeError(f"phase 2 (resume) failed rc={rc}:\n{tail}")
    t2 = time.time()

    checks, detail = validate(a, a.workdir, killed_at)
    result = {
        "ok": all(checks.values()),
        "checks": checks,
        "detail": detail,
        "total_steps": a.total_steps,
        "phase1_s": round(t1 - t0, 1),
        "phase2_s": round(t2 - t1, 1),
    }
    print("SOAK_RESULT " + json.dumps(result), flush=True)
    sys.exit(0 if result["ok"] else 1)


if __name__ == "__main__":
    main()
