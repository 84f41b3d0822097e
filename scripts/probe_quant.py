"""On-chip W8A8 int8 serving probe (single TPU claim).

Answers the gating question for ops/quant.py: does s8 x s8 -> s32
`dot_general` actually beat bf16 on THIS chip, and what does that buy the
full XL denoiser forward (Amdahl over the ~50-65% matmul share)?

Measures, in one process:
  1. isolated dense: fp bf16 Dense vs quant_dense_apply at DiT hot shapes
     (tokens x 1152 -> {3456, 4608, 1152}) at trajectory (B=4) and SCG
     candidate (B=64) widths;
  2. full DiTRotary_XL_8 forward at B=1/4/64 across serving variants:
     fp32 params, bf16-cast params, w8a16 weight-only int8, w8a8;
  3. numerics spot check (relative error fp vs quant on random weights).

Results recorded in docs/PERF.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)


def _sync(out):
    """Hard execution barrier — block_until_ready is unreliable on the axon
    runtime (see bench.py:_sync); a host transfer of the result cannot
    complete before the execution has."""
    return float(jnp.sum(jnp.abs(out).astype(jnp.float32)))


def timeit(fn, *args, reps=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    from rule_guided_music_tpu.models import DiT_models
    from rule_guided_music_tpu.ops.quant import (
        quant_dense_apply,
        quantize_dense,
        quantize_dit_params,
    )
    from rule_guided_music_tpu.pipeline import _init_on_host

    print(f"devices: {jax.devices()}", flush=True)

    # -- 1. isolated dense --------------------------------------------------
    print("== isolated dense (ms) ==", flush=True)
    rng = np.random.RandomState(0)
    for b in (4, 64):
        ntok = b * 256
        for d_out in (3456, 4608, 1152):
            k = rng.randn(1152, d_out).astype(np.float32) * 0.02
            q, s = quantize_dense(k)
            kd = jnp.asarray(k, dtype=jnp.bfloat16)
            qd, sd = jnp.asarray(q), jnp.asarray(s)
            x = jnp.asarray(rng.randn(ntok, 1152).astype(np.float32),
                            dtype=jnp.bfloat16)

            fp = jax.jit(lambda xx, kk: xx @ kk)
            qfn = jax.jit(lambda xx, kk, ss: quant_dense_apply(
                xx, kk, ss, None, dtype=jnp.bfloat16))
            t_fp = timeit(fp, x, kd)
            t_q = timeit(qfn, x, qd, sd)
            print(f"  tokens={ntok:6d} 1152x{d_out}: "
                  f"bf16 {t_fp*1e3:7.3f}  int8 {t_q*1e3:7.3f}  "
                  f"speedup {t_fp/t_q:5.2f}x", flush=True)

    # -- 2. full XL forward -------------------------------------------------
    print("== XL denoiser forward (ms) ==", flush=True)
    dtype = jnp.bfloat16
    common = dict(input_size=(128, 16), in_channels=4, num_classes=3,
                  learn_sigma=False, dtype=dtype)
    fp_model = DiT_models["DiTRotary_XL_8"](**common)
    q_model = DiT_models["DiTRotary_XL_8"](**common, quant="w8a8")
    wo_model = DiT_models["DiTRotary_XL_8"](**common, quant="w8a16")
    x1 = jnp.zeros((1, 4, 128, 16))
    params = _init_on_host(
        fp_model.init, jax.random.PRNGKey(0), x1, jnp.zeros((1,)),
        jnp.zeros((1,), dtype=jnp.int32),
    )
    # perturb away from init: adaLN-Zero outputs exactly 0 at init, which
    # would make the rel-err check vacuous (CLAUDE.md)
    params = jax.tree_util.tree_map(
        lambda a: np.asarray(a) + 0.02 * rng.randn(*a.shape).astype(np.float32),
        params)
    q_params = quantize_dit_params(params)
    # bf16-cast fp params: halves weight streaming with no code change
    bf16_params = jax.tree_util.tree_map(
        lambda a: a.astype(np.float32).astype(jnp.bfloat16)
        if a.dtype in (np.float32, np.float64) else a, params)
    # ship all trees to HBM ONCE — leaving them as host numpy re-transfers
    # ~GBs through the tunnel on every call and times the network, not the
    # chip (r3 session 2: 90 s/forward until this line existed)
    print("  transferring params (fp32 + bf16 + 2x int8)...", flush=True)
    params = jax.device_put(params)
    bf16_params = jax.device_put(bf16_params)
    q_params = jax.device_put(q_params)
    jax.block_until_ready((params, bf16_params, q_params))

    fwd_fp = jax.jit(fp_model.apply)
    fwd_q = jax.jit(q_model.apply)
    fwd_wo = jax.jit(wo_model.apply)
    for b in (1, 4, 64):
        x = jnp.asarray(rng.randn(b, 4, 128, 16).astype(np.float32))
        t = jnp.full((b,), 500.0)
        y = jnp.zeros((b,), dtype=jnp.int32)
        t_fp = timeit(fwd_fp, params, x, t, y, reps=10)
        t_bf = timeit(fwd_fp, bf16_params, x, t, y, reps=10)
        t_wo = timeit(fwd_wo, q_params, x, t, y, reps=10)
        t_q = timeit(fwd_q, q_params, x, t, y, reps=10)
        e_fp = fwd_fp(params, x, t, y).astype(jnp.float32)
        nrm = float(jnp.linalg.norm(e_fp)) + 1e-9
        rel_wo = float(jnp.linalg.norm(
            fwd_wo(q_params, x, t, y).astype(jnp.float32) - e_fp)) / nrm
        rel_q = float(jnp.linalg.norm(
            fwd_q(q_params, x, t, y).astype(jnp.float32) - e_fp)) / nrm
        print(f"  B={b:3d}: fp32 {t_fp*1e3:7.2f}  bf16w {t_bf*1e3:7.2f} "
              f"({t_fp/t_bf:4.2f}x)  w8a16 {t_wo*1e3:7.2f} "
              f"({t_fp/t_wo:4.2f}x, rel {rel_wo:.4f})  w8a8 {t_q*1e3:7.2f} "
              f"({t_fp/t_q:4.2f}x, rel {rel_q:.4f})", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
