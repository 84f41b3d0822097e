"""One-process TPU performance characterization.

Measures, in a single device claim: unguided DDIM-1000 throughput, SCG
throughput at batch 4 and 8, and the per-component costs (XL denoiser at
candidate batch, VAE chunk decode at SCG width). Writes docs/PERF notes to
stdout; used to steer optimization between rounds.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)


def timeit(fn, *args, reps=5, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    from rule_guided_music_tpu.diffusion.sampling import (
        GuidanceConfig,
        SCGConfig,
        SamplerConfig,
    )
    from rule_guided_music_tpu.diffusion.schedule import make_schedule
    from rule_guided_music_tpu.models import AutoencoderKL, DiT_models
    from rule_guided_music_tpu.pipeline import _init_on_host, make_sample_fn

    dtype = jnp.bfloat16
    print("== init ==", flush=True)
    model = DiT_models["DiTRotary_XL_8"](
        input_size=(128, 16), in_channels=4, num_classes=3,
        learn_sigma=False, dtype=dtype,
    )
    x1 = jnp.zeros((1, 4, 128, 16))
    params = _init_on_host(
        model.init, jax.random.PRNGKey(0), x1, jnp.zeros((1,)),
        jnp.zeros((1,), dtype=jnp.int32),
    )
    vae = AutoencoderKL(dtype=dtype)
    vae_params = _init_on_host(
        vae.init, jax.random.PRNGKey(1), jnp.zeros((1, 3, 128, 128)),
        rng=jax.random.PRNGKey(2),
    )

    profile_dir = os.environ.get("PERF_PROBE_TRACE_DIR", "")
    fwd = jax.jit(model.apply)
    dec = jax.jit(lambda p, z: vae.apply(p, z, method=AutoencoderKL.decode))

    # -- component costs ----------------------------------------------------
    # PERF_PROBE_TRACE_DIR=<dir> wraps the component sweep in a
    # jax.profiler trace (op-level timeline, TensorBoard-viewable).
    import contextlib

    from rule_guided_music_tpu.utils import logger as _logger

    trace_cm = (_logger.jax_trace(profile_dir) if profile_dir
                else contextlib.nullcontext())
    print("== components ==", flush=True)
    with trace_cm:
        for b in (4, 64, 68):
            x = jnp.zeros((b, 4, 128, 16))
            t = jnp.zeros((b,))
            y = jnp.zeros((b,), dtype=jnp.int32)
            ms = timeit(fwd, params, x, t, y, reps=10) * 1000
            flops = 2 * 675e6 * 256 * b
            print(f"denoiser B={b}: {ms:7.2f} ms  ({flops/ms*1e-9:.0f} TFLOP/s)",
                  flush=True)
        for n in (32, 512):
            z = jnp.zeros((n, 4, 16, 16))
            ms = timeit(dec, vae_params, z, reps=5) * 1000
            flops = 75e9 * n
            print(f"vae decode N={n}: {ms:7.2f} ms  ({flops/ms*1e-9:.0f} TFLOP/s)",
                  flush=True)

    # -- unguided DDIM-1000 --------------------------------------------------
    print("== chains ==", flush=True)
    tables = make_schedule("linear", 1000, timestep_respacing="50").tables()
    for batch in (4, 16):
        cfg = SamplerConfig(sampler="ddim", eta=1.0)
        gen = make_sample_fn(
            denoiser_model=model, tables=tables, sampler_config=cfg,
            gen_shape=(batch, 4, 128, 16), use_decode=False, num_classes=3,
        )
        bundle = {"denoiser": params, "vae": None, "classifiers": ()}
        y = jnp.zeros((batch,), dtype=jnp.int32)
        run = lambda r: gen(r, bundle, {}, y)[0]
        sec = timeit(run, jax.random.PRNGKey(0), reps=2)
        full = sec * 1000 / 50
        print(f"unguided DDIM-1000 B={batch}: {full:.1f}s/chain "
              f"-> {batch*60/full:.2f} excerpts/min/chip", flush=True)

    # -- SCG batch scaling ----------------------------------------------------
    for batch in (4,):  # B=8 OOMs: k*B=128 candidate VAE decode > 16GB HBM
        cfg = SamplerConfig(
            sampler="ddpm",
            guidance=GuidanceConfig(method="no_guidance", schedule=True,
                                    t_start=30, t_end=0, interval=1),
            scg=SCGConfig(num_samples=16,
                          weights=(("pitch_hist", 40.0),
                                   ("note_density", 1.0),
                                   ("chord_progression", 1.0))),
        )
        gen = make_sample_fn(
            denoiser_model=model, tables=make_schedule(
                "linear", 1000, timestep_respacing="40").tables(),
            sampler_config=cfg, gen_shape=(batch, 4, 128, 16),
            vae_model=vae, use_decode=True, scale_factor=1.2465,
            num_classes=3,
        )
        bundle = {"denoiser": params, "vae": vae_params, "classifiers": ()}
        rules = {
            "pitch_hist": jnp.ones((batch, 12)) / 12.0,
            "note_density": jnp.ones((batch, 16)) * 2.0,
            "chord_progression": jnp.ones((batch, 8), dtype=jnp.int32),
        }
        y = jnp.zeros((batch,), dtype=jnp.int32)
        run = lambda r: gen(r, bundle, rules, y)[0]
        sec = timeit(run, jax.random.PRNGKey(0), reps=1)
        full = sec * 1000 / 40
        print(f"SCG(no-cls) DDPM-1000 B={batch}: {full:.1f}s/chain "
              f"-> {batch*60/full:.2f} excerpts/min/chip", flush=True)


if __name__ == "__main__":
    main()
