"""Rule-guided generation CLI — the flagship entry point.

TPU re-architecture of the reference's scripts/sample_rule.py: assembles
denoiser/VAE/classifiers from args + YAML guidance config, resolves target
rules (given in YAML or extracted from a test set), runs the whole guided
reverse chain as ONE jitted scan on device, decodes to piano rolls, writes
.midi files plus results.csv / summary.csv under loggings/<config-path>.

Reference YAML configs (scripts/configs/**) work unchanged.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rule_guided_music_tpu import pipeline
from rule_guided_music_tpu.config import (
    add_dict_to_argparser,
    load_config,
    model_and_diffusion_defaults,
    sampler_config_from_yaml,
)
from rule_guided_music_tpu.constants import BACKGROUND_THRESHOLD
from rule_guided_music_tpu.data.pianoroll import (
    finalize_decoded_sample,
    save_piano_roll_midi,
)
from rule_guided_music_tpu.diffusion.schedule import make_schedule
from rule_guided_music_tpu.utils import logger


def main():
    args = create_argparser().parse_args()
    root_dir = "cond_demo/"
    if "cond_table/" in args.config_path:
        args.dir = (root_dir
                    + os.path.splitext(args.config_path.split("cond_table/")[-1])[0]
                    + f"_cls_{args.class_label}")
    else:
        args.dir = (root_dir
                    + os.path.splitext(args.config_path.split(root_dir)[-1])[0]
                    + f"_cls_{args.class_label}")

    logger.configure(args=args)
    config = load_config(args.config_path)
    # YAML respacing applies to any non-ancestral sampler config: the
    # reference only reads it for use_ddim (sample_rule.py:78-81 upstream),
    # but the beyond-reference dpmpp/dpmpp-SDE serving configs
    # (scripts/configs_serving/) carry their few-step budget the same way.
    if getattr(config.sampling, "use_ddim", False) or \
            str(getattr(config.sampling, "sampler", "") or "") == "dpmpp":
        args.timestep_respacing = getattr(
            config.sampling, "timestep_respacing", args.timestep_respacing
        )

    logger.log("creating model and diffusion...")
    denoiser = pipeline.DenoiserBundle.create(
        args.model,
        input_size=args.image_size,
        in_channels=args.in_channels,
        num_classes=args.num_classes,
        learn_sigma=args.learn_sigma,
        model_path=args.model_path,
        quant=args.quant,
    )
    schedule = make_schedule(
        noise_schedule=args.noise_schedule,
        steps=args.diffusion_steps,
        timestep_respacing=args.timestep_respacing,
        rescale_timesteps=args.rescale_timesteps,
    )
    tables = schedule.tables()

    vae = pipeline.VAEBundle.create(
        vae_path=args.vae_path, scale_factor=args.scale_factor,
        arch=_parse_vae_arch(args.vae_arch),
    ) if args.vae else None

    classifier_metas = []
    classifier_params = []
    if config.guidance.nn:
        logger.log("loading classifiers...")
        cc = config.guidance.cond_fn.classifiers
        bundles = pipeline.build_classifier_bundles(
            cc, input_size=args.image_size, in_channels=args.in_channels,
        )
        for i, (cls_model, cls_params) in enumerate(bundles):
            classifier_metas.append(pipeline.ClassifierSpecMeta(
                fn=config.guidance.cond_fn.fns[i],
                rule_name=config.guidance.cond_fn.rule_names[i],
                scale=float(config.guidance.cond_fn.classifier_scales[i]),
                model=cls_model,
            ))
            classifier_params.append(cls_params)
    elif getattr(config.guidance, "cond_fn", None) is not None:
        for i, fn in enumerate(config.guidance.cond_fn.fns):
            classifier_metas.append(pipeline.ClassifierSpecMeta(
                fn=fn,
                rule_name=config.guidance.cond_fn.rule_names[i],
                scale=float(config.guidance.cond_fn.classifier_scales[i]),
                model=None,
            ))

    # --- generation geometry (plain vs DiffCollage) ----------------------
    collage = None
    if getattr(config.sampling, "diff_collage", False):
        from rule_guided_music_tpu.diffusion.collage import (
            circle_length,
            linear_length,
        )

        circle = config.dc.type == "circle"
        overlap = config.dc.overlap_size
        num_img = config.dc.num_img
        t_long = (circle_length(num_img, overlap) if circle
                  else linear_length(num_img, overlap))
        collage = dict(num_img=num_img, overlap=overlap, circle=circle)
        gen_shape = (args.batch_size, args.in_channels, t_long,
                     args.image_size[1])
    else:
        gen_shape = (args.batch_size, args.in_channels,
                     args.image_size[0], args.image_size[1])

    # --- target rules ------------------------------------------------------
    target_rules = vars(config.target_rules)
    given = all(v is not None for v in target_rules.values())
    if given:
        rules = pipeline.resolve_given_targets(target_rules, args.batch_size)
    else:
        if "vertical_nd" in target_rules:
            target_rules["note_density"] = None
            target_rules.pop("vertical_nd")
            target_rules.pop("horizontal_nd")
        logger.log(f"extracting targets from test set cls {args.class_label}...")
        from rule_guided_music_tpu.data.datasets import load_data

        val_data = load_data(
            data_dir=args.data_dir + "_test_cls_" + str(args.class_label) + ".csv",
            batch_size=args.batch_size,
            class_cond=True,
            deterministic=bool(args.record or args.deterministic),
            image_size=gen_shape[2] * 8,
            rule=None,
            prefetch=0,
        )
        gt, _ = next(val_data)
        rules = pipeline.extract_targets_from_rolls(
            list(target_rules.keys()), jnp.asarray(gt)
        )

    sampler_config = sampler_config_from_yaml(
        config, learn_sigma=args.learn_sigma, record=args.record,
        record_states=args.record_states,
        rule_names=list(rules.keys()),
    )
    # CLI overrides of the cross-step trajectory-reuse accelerator
    # (quality-gated approximation, docs/PERF.md; tests/test_reuse.py).
    # Each flag overrides independently so a YAML-configured window is not
    # clobbered by restating --reuse_interval (and --reuse_interval 0/1
    # disables YAML-enabled reuse).
    from dataclasses import replace as _replace

    if args.reuse_interval >= 0:
        sampler_config = _replace(sampler_config,
                                  reuse_interval=args.reuse_interval)
    if args.reuse_t_max >= -1:
        sampler_config = _replace(sampler_config,
                                  reuse_t_max=args.reuse_t_max)

    y = None
    if args.class_cond:
        y = jnp.full((args.batch_size,), args.class_label, dtype=jnp.int32)

    save_dir = logger.get_dir()
    os.makedirs(os.path.expanduser(save_dir), exist_ok=True)

    params_bundle = {
        "denoiser": denoiser.params,
        "vae": vae.params if vae else None,
        "classifiers": tuple(classifier_params),
    }
    # opt-in light-scoring levers (selection-only; docs/PERF.md): distilled
    # decoder / rule-feature head / rollout student rank SCG candidates,
    # final decode + trajectory stay full
    scoring = pipeline.ScoringBundle.create(
        decoder_path=args.scoring_decoder_path,
        features_path=args.scoring_features_path,
        rollout=args.scoring_rollout,
        rollout_path=args.scoring_rollout_path,
        input_size=args.image_size,
        in_channels=args.in_channels,
        num_classes=args.num_classes,
        learn_sigma=args.learn_sigma,
    )
    params_bundle.update(scoring.params)
    sample_fn_kwargs = dict(
        denoiser_model=denoiser.model,
        tables=tables,
        sampler_config=sampler_config,
        gen_shape=gen_shape,
        vae_model=vae.model if vae else None,
        classifier_metas=classifier_metas,
        guidance_method=getattr(config.guidance, "method", "no_guidance"),
        use_decode=bool(config.guidance.vae and vae),
        scale_factor=args.scale_factor,
        num_classes=args.num_classes,
        class_cond=args.class_cond,
        cfg=args.cfg,
        w=args.w,
        collage=collage,
        mesh=_make_mesh_from_arg(args.mesh),
        **scoring.model_kwargs,
    )
    generate = pipeline.make_sample_fn(**sample_fn_kwargs)
    if args.segments > 1:
        # segmented (streaming/resumable) chain: N bounded dispatches with
        # carried state, same per-step program as the contiguous chain
        # (diffusion/sampling.py t_begin/t_stop; tests/test_chain_segments.py)
        if args.record:
            raise ValueError("--record with --segments > 1 is unsupported "
                             "(per-step records span dispatch boundaries)")
        generate = _make_segmented_generate(
            sample_fn_kwargs, tables.num_timesteps, args.segments, gen_shape)
    decode_rolls = (pipeline.make_decode_rolls_fn(vae.model, args.scale_factor)
                    if vae else None)

    logger.log("sampling...")
    import pandas as pd

    all_results = pd.DataFrame()
    count, rng = 0, jax.random.PRNGKey(args.seed)
    while count < args.num_samples:
        rng, sub = jax.random.split(rng)
        latents, records = generate(sub, params_bundle, rules, y)
        rolls = decode_rolls(vae.params, latents) if vae else latents
        arr = finalize_decoded_sample(np.asarray(rolls), BACKGROUND_THRESHOLD)
        if args.save_files:
            save_piano_roll_midi(
                arr, save_dir, args.fs,
                y=np.asarray(y) if y is not None else None, save_ind=count,
            )
        generated = jnp.asarray(arr.astype(np.float32) / 63.5 - 1.0)
        results = pipeline.eval_rule_loss(generated, rules)
        all_results = pd.concat([all_results, results], ignore_index=True)
        if args.save_files:
            all_results.to_csv(os.path.join(save_dir, "results.csv"), index=False)
        count += args.batch_size
        logger.log(f"created {count} samples")

    if args.save_files:
        all_results.to_csv(os.path.join(save_dir, "results.csv"), index=False)
        loss_stats = pipeline.summarize_losses(all_results)
        loss_stats.to_csv(os.path.join(save_dir, "summary.csv"))
        print(loss_stats)

    if args.record:
        import pickle

        rec_np = {k: np.asarray(v) for k, v in records.items()}
        states = rec_np.pop("state", None)
        with open(os.path.join(save_dir, "record.pkl"), "wb") as f:
            pickle.dump(rec_np, f)
        from rule_guided_music_tpu.utils.viz import plot_records

        plot_records(rec_np, save_dir)
        if states is not None and decode_rolls is not None:
            # decode + dump a few intermediate states as piano-roll images
            # (reference --record intermediate dumps)
            from rule_guided_music_tpu.utils.viz import save_piano_roll_image

            idx = np.linspace(0, len(states) - 1, 6, dtype=int)
            inter = decode_rolls(params_bundle["vae"],
                                 jnp.asarray(states[idx, 0]))
            inter = finalize_decoded_sample(
                np.asarray(inter), BACKGROUND_THRESHOLD)
            for j, step_i in enumerate(idx):
                save_piano_roll_image(
                    inter[j], os.path.join(save_dir,
                                           f"state_step{step_i}.png"))
        logger.log(f"wrote per-step diagnostics to {save_dir}/record.pkl")

    logger.log("sampling complete")


def _make_segmented_generate(sample_fn_kwargs, num_steps, n_seg, gen_shape):
    """N bounded dispatches covering [num_steps..0), carrying x between
    them — keeps any single device dispatch short (remote-attachment RPC
    deadlines) and streams progress."""
    step_per = max(1, num_steps // n_seg)
    bounds = []
    hi = num_steps
    while hi > 0:
        lo = max(0, hi - step_per) if len(bounds) < n_seg - 1 else 0
        bounds.append((hi, lo))
        hi = lo
    fns = [pipeline.make_sample_fn(t_begin=h, t_stop=l, **sample_fn_kwargs)
           for h, l in bounds]

    def generate(rng, params_bundle, rules, y):
        keys = jax.random.split(rng, len(fns) + 1)
        x = jax.random.normal(keys[0], gen_shape)
        records = None
        for fn, kk, (h, l) in zip(fns, keys[1:], bounds):
            x, records = fn(kk, params_bundle, rules, y, noise=x)
            logger.log(f"  segment t=[{h}..{l}) done")
        return x, records

    return generate


def _parse_vae_arch(spec: str):
    """--vae_arch '{"ch": 32, "ch_mult": [1,1,2,2], "num_res_blocks": 1}'
    -> AutoencoderKL constructor overrides ('' = production f8 geometry)."""
    if not spec:
        return None
    import json

    return json.loads(spec)


def _make_mesh_from_arg(spec: str):
    """'dp[,fsdp[,tp]]' -> parallel.make_mesh; '' / unset -> None."""
    if not spec:
        return None
    from rule_guided_music_tpu.parallel.mesh import make_mesh

    parts = [int(p) for p in str(spec).split(",")]
    dp = parts[0] if parts else None
    fsdp = parts[1] if len(parts) > 1 else 1
    tp = parts[2] if len(parts) > 2 else 1
    return make_mesh(dp=dp or None, fsdp=fsdp, tp=tp)


def create_argparser():
    defaults = dict(
        project="music-sampling",
        dir="",
        data_dir="",
        config_path="",
        model="DiTRotary_XL_8",
        model_path="",
        vae="kl/f8-all-onset",
        vae_path="",
        # JSON AutoencoderKL geometry overrides, e.g. tiny test fixtures:
        # '{"ch": 32, "ch_mult": [1,1,2,2], "num_res_blocks": 1}'
        vae_arch="",
        clip_denoised=False,
        num_samples=128,
        batch_size=16,
        scale_factor=1.0,
        fs=100,
        num_classes=3,
        class_label=1,
        class_cond=True,
        cfg=False,
        w=4.0,
        classifier_scale=1.0,
        record=False,
        record_states=False,
        save_files=True,
        deterministic=False,
        seed=0,
        # multi-chip: 'dp[,fsdp[,tp]]' mesh over jax.devices(); '' = single
        mesh="",
        # int8 serving for the DiT trunk matmuls (ops/quant.py):
        # '' = off, 'w8a16' weight-only (the measured serving win),
        # 'w8a8' dynamic-activation; envelope tested in tests/test_quant.py
        quant="",
        # light-scoring levers (selection-only SCG ranking; docs/PERF.md)
        scoring_decoder_path="",
        scoring_features_path="",
        scoring_rollout="",
        scoring_rollout_path="",
        # >1: run the chain as N bounded dispatches (streaming/resumable)
        segments=0,
        # >1: recompute the trajectory denoiser every N steps, reuse between
        # (SmoothCache-family accelerator; incompatible with --segments).
        # 0/1 disables; -1 (default) defers to the YAML sampling block
        reuse_interval=-1,
        # always refresh at t >= this (stale-eps amplification guard);
        # -1 = no window; -2 (default) defers to the YAML sampling block
        reuse_t_max=-2,
    )
    defaults.update(model_and_diffusion_defaults())
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


if __name__ == "__main__":
    main()
