"""On-chip training-throughput probe (single TPU claim, single process).

docs/PERF.md measures the sampling side exhaustively but round 2 shipped no
*measured* training numbers — the TrainLoop was validated on the virtual CPU
mesh only.  This probe times, on real hardware, the pieces of the reference
training recipe (train_util.py:319-400; README.md:92-124 — 8 GPUs x batch 32,
1.2 M steps):

  1. the on-the-fly VAE encode + shifted-window recombination
     (``get_kl_input``: 20 x 1.28 s chunks -> encode_rep=4 overlapping
     10.24 s latent excerpts, train_util.py:403-429),
  2. the jitted XL train step (fwd + bwd + optimizer + EMA + NaN guard) for
     the optimizer/remat configurations that matter on a 16 GB chip:
       - adafactor + remat  (the config that lets XL train on ONE chip),
       - adamw + remat      (reference-parity optimizer, ~10.8 GB of
                             fp32 state before activations),
       - adafactor, no remat (speed of the memory-unconstrained step),
  3. end-to-end examples/s at the reference per-chip geometry (batch 32
     latents/step after recombination) and the derived wall-clock for the
     reference's 1.2 M-step run on an 8-chip DP slice (same per-chip batch
    -> effective 256, step time ~ single-chip step + psum).

Every stage is exception-guarded (an OOM config reports and moves on) and
device data stays resident between reps so the remote-tunnel transfer
artifact of this environment doesn't pollute the step timing; the one
host->device batch transfer is timed separately.

Usage:  JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/train_probe.py
        TRAIN_PROBE_TINY=1  -> XS smoke geometry (CPU-testable plumbing).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))

_T0 = time.perf_counter()


def log(msg):
    print(f"[train_probe {time.perf_counter() - _T0:.0f}s] {msg}", flush=True)


def hbm_peak(label):
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and stats.get("peak_bytes_in_use") is not None:
            log(f"{label}: hbm peak={stats['peak_bytes_in_use']/1e9:.2f}GB")
    except Exception:
        pass


def zeros_like_init(init_fn, *args, **kwargs):
    shapes = jax.eval_shape(init_fn, *args, **kwargs)
    return jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def sync(x):
    """Hard execution barrier: on the axon runtime block_until_ready can
    return before execution completes (bench.py _sync); a host transfer of
    a value cannot."""
    return float(jnp.sum(x).astype(jnp.float32))


def main():
    from rule_guided_music_tpu.diffusion import gaussian as gd
    from rule_guided_music_tpu.diffusion.schedule import make_schedule
    from rule_guided_music_tpu.models import AutoencoderKL, DiT_models
    from rule_guided_music_tpu.training.train_loop import (
        TrainConfig,
        get_kl_input,
        make_optimizer,
        make_train_step,
    )

    tiny = os.environ.get("TRAIN_PROBE_TINY") == "1"
    if tiny:
        model_name, vae_ch, vae_mult, vae_blocks = (
            "DiTRotary_XS_8", 16, (1, 1, 2, 2), 1)
        loader_b, seq_len, reps = 2, 20, 1
    else:
        model_name, vae_ch, vae_mult, vae_blocks = (
            "DiTRotary_XL_8", 128, (1, 2, 2, 4), 2)
        loader_b, seq_len, reps = 8, 20, 3
    # recombination geometry (train_util.py:403-429): seq_len=20 chunks,
    # window 8 chunks, shift 4 -> encode_rep 4, so the loader batch of 8
    # long rolls becomes the reference's per-device batch of 32 latents.
    encode_rep = (seq_len - 8) // 4 + 1
    train_b = loader_b * encode_rep
    tokens_per_example = 256

    log(f"model={model_name} loader_batch={loader_b} -> "
        f"train_batch={train_b} (encode_rep={encode_rep})")

    dtype = jnp.bfloat16
    tables = make_schedule("linear", 1000).tables()

    vae = AutoencoderKL(ch=vae_ch, ch_mult=vae_mult,
                        num_res_blocks=vae_blocks, dtype=dtype)
    vae_params = zeros_like_init(
        vae.init, jax.random.PRNGKey(0), jnp.zeros((1, 3, 128, 128)),
        rng=jax.random.PRNGKey(1))

    # --- stage 1: VAE encode + recombination --------------------------------
    log("stage: get_kl_input (VAE encode + shifted-window recombination)")
    encode = jax.jit(lambda vp, batch: get_kl_input(
        lambda chunks: vae.apply(vp, chunks,
                                 method=AutoencoderKL.encode_moments),
        batch, scale_factor=1.2465, shift_size=4))
    host_batch = np.random.default_rng(0).standard_normal(
        (loader_b, 3, 128, 128 * seq_len)).astype(np.float32)
    t0 = time.perf_counter()
    dev_batch = jax.device_put(jnp.asarray(host_batch))
    jax.block_until_ready(dev_batch)
    transfer_s = time.perf_counter() - t0
    log(f"host->device batch transfer ({host_batch.nbytes/1e6:.0f} MB): "
        f"{transfer_s*1000:.0f} ms "
        f"({host_batch.nbytes/1e6/max(transfer_s,1e-9):.0f} MB/s)")
    latents = encode(vae_params, dev_batch)
    sync(latents)                           # compile + first
    t0 = time.perf_counter()
    for _ in range(reps):
        latents = encode(vae_params, dev_batch)
    sync(latents)
    enc_ms = (time.perf_counter() - t0) / reps * 1000
    log(f"get_kl_input: {enc_ms:.1f} ms -> {latents.shape} latents")
    hbm_peak("after encode")

    # --- stage 2: train-step configurations ---------------------------------
    def probe_step(opt_name, remat, microbatch=-1):
        label = (f"{opt_name}{'+remat' if remat else ''}"
                 + (f"+micro{microbatch}" if microbatch > 0 else ""))
        log(f"stage: train step [{label}]")
        model = DiT_models[model_name](
            input_size=(128, 16), in_channels=4, num_classes=3,
            learn_sigma=False, class_dropout_prob=0.1, dtype=dtype,
            remat=remat)
        x0 = jnp.zeros((1, 4, 128, 16))
        params = zeros_like_init(
            lambda rngs, x, t, y: model.init(rngs, x, t, y, train=True),
            {"params": jax.random.PRNGKey(2),
             "label_dropout": jax.random.PRNGKey(3)},
            x0, jnp.zeros((1,)), jnp.zeros((1,), dtype=jnp.int32))
        n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))

        config = TrainConfig(lr=1e-4, optimizer=opt_name,
                             microbatch=microbatch, scale_factor=1.2465)
        optimizer = make_optimizer(config)

        def model_apply(p, x, model_t, y, rng):
            return model.apply(p, x, model_t, y, train=True,
                               rngs={"label_dropout": rng})

        step_fn = jax.jit(
            make_train_step(model_apply, tables, optimizer, config),
            donate_argnums=(0,))

        state = {
            "params": params,
            "ema_params": jax.tree_util.tree_map(jnp.copy, params),
            "opt_state": jax.jit(optimizer.init)(params),
            "step": jnp.zeros((), dtype=jnp.int32),
        }
        lat = jax.random.normal(
            jax.random.PRNGKey(4), (train_b, 4, 128, 16)) / 1.2465
        t = jnp.arange(train_b, dtype=jnp.int32) * (1000 // train_b)
        w = jnp.ones((train_b,))
        y = jnp.zeros((train_b,), dtype=jnp.int32)

        t0 = time.perf_counter()
        state, metrics = step_fn(state, lat, t, w, y, jax.random.PRNGKey(5))
        sync(metrics["loss"])
        log(f"[{label}] compile+first: {time.perf_counter()-t0:.1f}s "
            f"(loss={float(metrics['loss']):.3f}, "
            f"params={n_params/1e6:.0f}M)")
        t0 = time.perf_counter()
        for i in range(reps):
            state, metrics = step_fn(state, lat, t, w, y,
                                     jax.random.fold_in(
                                         jax.random.PRNGKey(6), i))
        sync(metrics["loss"])
        step_s = (time.perf_counter() - t0) / reps
        ex_s = train_b / step_s
        mfu_flops = 6 * n_params * tokens_per_example * train_b
        log(f"[{label}] step: {step_s*1000:.0f} ms -> {ex_s:.1f} examples/s "
            f"({mfu_flops/step_s/1e12:.0f} TFLOP/s incl. bwd)")
        hbm_peak(f"[{label}]")
        # release before the next config claims its state
        del state
        return step_s

    results = {}
    for opt_name, remat, micro in (
        ("adafactor", True, -1),
        ("adamw", True, -1),
        ("adafactor", False, -1),
        ("adamw", False, -1),
    ):
        try:
            results[(opt_name, remat, micro)] = probe_step(
                opt_name, remat, micro)
        except Exception as e:
            log(f"[{opt_name}{'+remat' if remat else ''}] FAILED: {e!r}")

    # --- stage 3: derived end-to-end numbers --------------------------------
    best = min(results.values()) if results else None
    if best is not None:
        step_total = best + enc_ms / 1000.0
        log(f"end-to-end step (encode + train): {step_total*1000:.0f} ms "
            f"-> {train_b/step_total:.1f} examples/s/chip")
        days = 1.2e6 * step_total / 86400.0
        log(f"reference recipe (1.2M steps, effective batch 256 on an "
            f"8-chip DP slice at this per-chip step): ~{days:.1f} days")
    log("done")


if __name__ == "__main__":
    main()
