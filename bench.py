"""Benchmark: 10.24 s SCG all-rules generation throughput on one chip.

Measures the BASELINE.json headline: excerpts/min/chip for the flagship
config (scripts/configs/cond_table/all/scg_classifier_all.yml semantics:
DiTRotary_XL_8 denoiser, k=16 SCG candidates, pitch-hist + note-density +
chord rules scored on-device, 3 latent classifiers for classifier guidance,
KL-VAE f8 decode inside the loop, DDPM-1000 with guidance on t<750).

Also measures, and reports inside the metric string:
  * the DDIM-100 respaced variant of the same k=16 SCG workload (the
    reference's abla/sampling/ddim/ddim100.yml protocol, paper-validated
    quality) — run as a FULL 100-step chain, no extrapolation;
  * (if assets/scoring_decoder_ch64.npz exists) the headline chain with the
    distilled light scoring decoder (scripts/distill_scoring_decoder.py)
    doing SCG candidate ranking — opt-in, selection-only.

Method for the DDPM-1000 headline: the per-step work is shape-identical
across the chain, so we time a respaced 40-step chain with the same 3:1
guided:plain ratio (30 guided / 10 plain) and extrapolate linearly to the
full 750/250 split. Weights are random — throughput does not depend on
weight values.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
baseline is a model of the PyTorch reference on one A100 running the SAME
config: per-step FLOPs at 312 TFLOP/s bf16 x 40% MFU PLUS the host-side
music21 chord analysis the reference performs on every guided step
(k*B = 64 decoded candidates through a 4-process pool,
gaussian_diffusion.py:1361-1375) at a generous 0.25 s per candidate.
The metric string also reports the compute-only ratio (vs_compute_bound)
that ignores the chord pool entirely.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))

BATCH = 4
K = 16
FULL_GUIDED, FULL_PLAIN = 750, 250
BENCH_GUIDED, BENCH_PLAIN = 30, 10
DDIM_STEPS = 100
LIGHT_DECODER_NPZ = os.path.join(REPO, "assets", "scoring_decoder_ch64.npz")


def build():
    from rule_guided_music_tpu.diffusion.sampling import (
        GuidanceConfig,
        SCGConfig,
        SamplerConfig,
    )
    from rule_guided_music_tpu.diffusion.schedule import make_schedule
    from rule_guided_music_tpu.models import (
        AutoencoderKL,
        DiT_models,
        ScoringDecoder,
    )
    from rule_guided_music_tpu.pipeline import (
        ClassifierSpecMeta,
        _init_on_host,
        make_sample_fn,
    )

    dtype = jnp.bfloat16

    model = DiT_models["DiTRotary_XL_8"](
        input_size=(128, 16), in_channels=4, num_classes=3,
        learn_sigma=False, dtype=dtype,
    )
    x0 = jnp.zeros((BATCH, 4, 128, 16))
    t0 = jnp.zeros((BATCH,))
    y0 = jnp.zeros((BATCH,), dtype=jnp.int32)
    print("initializing XL denoiser...", flush=True)
    params = _init_on_host(model.init, jax.random.PRNGKey(0), x0, t0, y0)

    vae = AutoencoderKL(dtype=dtype)
    vae_params = _init_on_host(
        vae.init, jax.random.PRNGKey(1), jnp.zeros((1, 3, 128, 128)),
        rng=jax.random.PRNGKey(2),
    )

    metas, cls_params = [], []
    for name, num_classes, fn, rule, scale in [
        ("DiTRotary-S/8-cls", 12, "grad_nn_zt_mse", "pitch_hist", 400.0),
        ("DiTRotary-S/8-cls", 16, "grad_nn_zt_mse", "note_density", 10.0),
        ("DiTRotary-S/8-chord-cls", 8, "grad_nn_zt_chord",
         "chord_progression", 10.0),
    ]:
        cls_model = DiT_models[name](
            input_size=(128, 16), in_channels=4, num_classes=num_classes,
            dtype=dtype,
        )
        cls_params.append(
            _init_on_host(cls_model.init, jax.random.PRNGKey(3), x0, t0)
        )
        metas.append(ClassifierSpecMeta(fn=fn, rule_name=rule, scale=scale,
                                        model=cls_model))

    scg_kwargs = dict(
        num_samples=K,
        weights=(("pitch_hist", 40.0), ("note_density", 1.0),
                 ("chord_progression", 1.0)),
        # serialize rollout+decode in groups (identical semantics);
        # measured sweep: 0.582 (unchunked) -> 0.646 (4) -> 0.673 (8)
        # -> 0.697 (16) -> 0.712 (32) excerpts/min
        decode_chunks=32,
    )
    common = dict(
        denoiser_model=model,
        gen_shape=(BATCH, 4, 128, 16),
        vae_model=vae,
        classifier_metas=metas,
        guidance_method="classifier_guidance",
        use_decode=True,
        scale_factor=1.2465,
        num_classes=3,
        class_cond=True,
    )

    variants = {}

    # headline: DDPM-1000 measured on a respaced shape-identical 40 chain
    steps = BENCH_GUIDED + BENCH_PLAIN
    ddpm_tables = make_schedule(
        "linear", 1000, timestep_respacing=str(steps)).tables()
    ddpm_config = SamplerConfig(
        sampler="ddpm",
        guidance=GuidanceConfig(method="classifier_guidance", schedule=True,
                                t_start=BENCH_GUIDED, t_end=0, interval=1),
        scg=SCGConfig(**scg_kwargs),
    )
    variants["ddpm1000"] = make_sample_fn(
        tables=ddpm_tables, sampler_config=ddpm_config, **common)

    # ddim100: the abla respaced protocol, full 100-step chain, SCG every step
    ddim_tables = make_schedule(
        "linear", 1000, timestep_respacing=f"ddim{DDIM_STEPS}").tables()
    ddim_config = SamplerConfig(
        sampler="ddim", eta=1.0,
        guidance=GuidanceConfig(method="classifier_guidance", schedule=True,
                                t_start=DDIM_STEPS, t_end=0, interval=1),
        scg=SCGConfig(**scg_kwargs),
    )
    variants["ddim100"] = make_sample_fn(
        tables=ddim_tables, sampler_config=ddim_config, **common)

    bundle = {
        "denoiser": params,
        "vae": vae_params,
        "classifiers": tuple(cls_params),
    }

    # opt-in light scoring decoder (selection only)
    light_agreement = None
    if os.path.exists(LIGHT_DECODER_NPZ):
        from rule_guided_music_tpu.utils.fixtures import unflatten_tree

        data = np.load(LIGHT_DECODER_NPZ)
        light_agreement = float(data["agreement"])
        light_params = unflatten_tree({
            k: np.asarray(data[k], dtype=np.float32)
            for k in data.files if k != "agreement"
        })
        light = ScoringDecoder(ch=64, dtype=dtype)
        variants["ddpm1000_light"] = make_sample_fn(
            tables=ddpm_tables, sampler_config=ddpm_config,
            scoring_vae_model=light, **common)
        variants["ddim100_light"] = make_sample_fn(
            tables=ddim_tables, sampler_config=ddim_config,
            scoring_vae_model=light, **common)
        bundle["scoring_vae"] = light_params
        print(f"light scoring decoder loaded "
              f"(agreement={light_agreement:.3f})", flush=True)

    rules = {
        "pitch_hist": jnp.ones((BATCH, 12)) / 12.0,
        "note_density": jnp.ones((BATCH, 16)) * 2.0,
        "chord_progression": jnp.ones((BATCH, 8), dtype=jnp.int32),
    }
    y = jnp.ones((BATCH,), dtype=jnp.int32)

    denoiser_step = jax.jit(model.apply)
    return variants, bundle, rules, y, denoiser_step, params, light_agreement


def _time_variant(generate, bundle, rules, y, label):
    print(f"compiling {label}...", flush=True)
    t0 = time.perf_counter()
    sample, _ = generate(jax.random.PRNGKey(0), bundle, rules, y)
    sample.block_until_ready()
    print(f"{label} compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    sample, _ = generate(jax.random.PRNGKey(1), bundle, rules, y)
    sample.block_until_ready()
    return time.perf_counter() - t0


def main():
    (variants, bundle, rules, y, denoiser_step, params,
     light_agreement) = build()

    # --- DDPM-1000 headline (respaced 40-step, extrapolated) --------------
    bench_wall = _time_variant(variants["ddpm1000"], bundle, rules, y,
                               "ddpm1000 (40-step probe)")
    scale = (FULL_GUIDED + FULL_PLAIN) / (BENCH_GUIDED + BENCH_PLAIN)
    ddpm_per_min = BATCH * 60.0 / (bench_wall * scale)

    # --- DDIM-100 (full chain, no extrapolation) ---------------------------
    ddim_wall = _time_variant(variants["ddim100"], bundle, rules, y,
                              "ddim100 (full chain)")
    ddim_per_min = BATCH * 60.0 / ddim_wall

    # --- light scoring decoder variants ------------------------------------
    light_per_min = ddim_light_per_min = None
    if "ddpm1000_light" in variants:
        light_wall = _time_variant(variants["ddpm1000_light"], bundle,
                                   rules, y, "ddpm1000+light-decoder")
        light_per_min = BATCH * 60.0 / (light_wall * scale)
        ddim_light_wall = _time_variant(variants["ddim100_light"], bundle,
                                        rules, y, "ddim100+light-decoder")
        ddim_light_per_min = BATCH * 60.0 / ddim_light_wall

    # --- bare denoiser per-step latency ------------------------------------
    x = jnp.zeros((BATCH, 4, 128, 16))
    t = jnp.zeros((BATCH,))
    yv = jnp.zeros((BATCH,), dtype=jnp.int32)
    denoiser_step(params, x, t, yv).block_until_ready()
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        out = denoiser_step(params, x, t, yv)
    out.block_until_ready()
    denoiser_ms = (time.perf_counter() - t0) / reps * 1000

    # --- reference FLOP-model baseline (A100, generous) --------------------
    dit_flops = 2 * 675e6 * 256                      # per example fwd
    vae_dec_flops = 75e9                             # per 128x128 chunk decode
    cls_flops = 3 * 2 * 33e6 * 257 * 3               # 3 classifiers fwd+bwd
    guided_step = (
        (1 + K) * BATCH * dit_flops
        + K * BATCH * 8 * vae_dec_flops
        + BATCH * cls_flops
    )
    plain_step = BATCH * dit_flops + BATCH * cls_flops
    total_flops = FULL_GUIDED * guided_step + FULL_PLAIN * plain_step
    a100_flops_per_s = 312e12 * 0.40
    ref_compute_wall = total_flops / a100_flops_per_s
    # chord pool: k*B candidates / 4 processes / step, 0.25 s per analysis
    chord_pool_wall = FULL_GUIDED * (K * BATCH / 4) * 0.25
    ref_wall = ref_compute_wall + chord_pool_wall
    ref_per_min = BATCH * 60.0 / ref_wall
    ref_compute_per_min = BATCH * 60.0 / ref_compute_wall

    # ddim100 reference model: same per-step work, 100 all-guided steps
    ref_ddim_wall = (DDIM_STEPS * guided_step / a100_flops_per_s
                     + DDIM_STEPS * (K * BATCH / 4) * 0.25)
    ref_ddim_per_min = BATCH * 60.0 / ref_ddim_wall

    extras = (f"ddim100={ddim_per_min:.3f}/min "
              f"(vs_ddim100_baseline={ddim_per_min / ref_ddim_per_min:.2f})")
    if light_per_min is not None:
        extras += (f", light_decoder={light_per_min:.3f}/min "
                   f"(selection_agreement={light_agreement:.3f}), "
                   f"ddim100_light={ddim_light_per_min:.3f}/min")

    print(
        json.dumps(
            {
                "metric": "excerpts/min/chip (10.24s SCG all-rules, k=16, "
                          f"DDPM-1000, denoiser_step_ms={denoiser_ms:.1f}, "
                          "vs_compute_bound="
                          f"{ddpm_per_min / ref_compute_per_min:.2f}, "
                          + extras + ")",
                "value": round(ddpm_per_min, 4),
                "unit": "excerpts/min/chip",
                "vs_baseline": round(ddpm_per_min / ref_per_min, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
