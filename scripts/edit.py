"""Excerpt editing CLI: regenerate a latent-time region under rule guidance.

Re-architecture of the reference scripts/edit.py: encode a source excerpt
(dataset row or MIDI file), mask the editable latent-time slice
[l_start, l_end), start the chain from the gt noised to ``noise_level``,
and denoise with replacement conditioning + guidance/SCG applied only on
the editable slice. Note-density targets support class shifting via the
bucketize + bin-center tables.
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
from rule_guided_music_tpu.constants import BACKGROUND_THRESHOLD, NORM_SCALE
from rule_guided_music_tpu.data.pianoroll import (
    finalize_decoded_sample,
    midi_to_roll,
    save_piano_roll_midi,
)
from rule_guided_music_tpu.data.midi_io import read_midi
from rule_guided_music_tpu.diffusion.schedule import make_schedule
from rule_guided_music_tpu.rules.registry import FUNC_DICT
from rule_guided_music_tpu.rules.tensor_rules import (
    HORIZONTAL_ND_BOUNDS,
    HORIZONTAL_ND_CENTER,
    VERTICAL_ND_BOUNDS,
    VERTICAL_ND_CENTER,
)
from rule_guided_music_tpu.utils import logger


def resolve_edit_targets(config, gt_partial, batch_size, rng,
                         nd_bins_file: str = ""):
    """Build target rules for the editable slice, incl. nd class shifting
    (reference edit.py:186-253).

    ``nd_bins_file``: optional JSON from eval_results/edit_create_bins.py
    ({vertical,horizontal}_{bounds,centers}) — dataset-derived nd class
    tables, already in rule-function units (no hr_scale division needed);
    defaults to the reference's hard-wired tables otherwise.
    """
    nd_bins = None
    if nd_bins_file:
        import json

        with open(nd_bins_file) as f:
            nd_bins = json.load(f)
    model_rules = {}
    target_rules = vars(config.target_rules)
    for rule_name, val in target_rules.items():
        if "horizontal" in rule_name:
            continue
        if "vertical" in rule_name:
            hr_nd = target_rules[rule_name.replace("vertical", "horizontal")]
            if "_hr_" in rule_name:
                hr_scale = int(rule_name.split("_hr_")[-1])
                nd_name = f"note_density_hr_{hr_scale}"
            else:
                hr_scale = 5
                nd_name = "note_density"
            orig_rule = FUNC_DICT[nd_name](gt_partial)
            if isinstance(val, int) or val is None:
                if nd_bins is not None:
                    vt_bounds = jnp.asarray(nd_bins["vertical_bounds"])
                    hr_bounds = jnp.asarray(nd_bins["horizontal_bounds"])
                    vt_center = jnp.asarray(nd_bins["vertical_centers"])
                    hr_center = jnp.asarray(nd_bins["horizontal_centers"])
                else:
                    vt_bounds = jnp.asarray(VERTICAL_ND_BOUNDS)
                    hr_bounds = jnp.asarray(HORIZONTAL_ND_BOUNDS) / hr_scale
                    vt_center = jnp.asarray(VERTICAL_ND_CENTER)
                    hr_center = jnp.asarray(HORIZONTAL_ND_CENTER) / hr_scale
                if isinstance(val, int):
                    v_shift = val
                    h_shift = 0
                else:
                    v_shift = int(rng.integers(-1, 2))
                    h_shift = int(rng.integers(-1, 2))
                half = orig_rule.shape[-1] // 2
                vt_cls = jnp.clip(
                    jnp.searchsorted(vt_bounds, orig_rule[:, :half]) + v_shift,
                    0, 7,
                )
                hr_cls = jnp.clip(
                    jnp.searchsorted(hr_bounds, orig_rule[:, half:]) + h_shift,
                    0, 7,
                )
                target = jnp.concatenate(
                    [vt_center[vt_cls], hr_center[hr_cls]], axis=-1
                )
            else:
                hr_rescaled = [x / hr_scale for x in hr_nd]
                target = jnp.tile(
                    jnp.asarray(list(val) + hr_rescaled)[None], (batch_size, 1)
                )
            model_rules[nd_name] = target
        elif "pitch" in rule_name and val is not None:
            v = jnp.asarray(val)
            model_rules[rule_name] = jnp.tile(
                (v / (v.sum() + 1e-12))[None], (batch_size, 1)
            )
        else:
            if val is not None:
                model_rules[rule_name] = jnp.tile(
                    jnp.asarray(val)[None], (batch_size, 1)
                )
            else:
                model_rules[rule_name] = FUNC_DICT[rule_name](gt_partial)
    return model_rules


def main():
    args = create_argparser().parse_args()
    root_dir = "edit_demo/"
    args.dir = (root_dir
                + os.path.splitext(args.config_path.split(root_dir)[-1])[0]
                + f"_cls_{args.class_label}")
    logger.configure(args=args)
    config = load_config(args.config_path)
    if getattr(config.sampling, "use_ddim", False):
        args.timestep_respacing = getattr(
            config.sampling, "timestep_respacing", args.timestep_respacing
        )

    denoiser = pipeline.DenoiserBundle.create(
        args.model, input_size=args.image_size, in_channels=args.in_channels,
        num_classes=args.num_classes, learn_sigma=args.learn_sigma,
        model_path=args.model_path,
    )
    tables = make_schedule(
        args.noise_schedule, args.diffusion_steps,
        timestep_respacing=args.timestep_respacing,
    ).tables()
    vae = pipeline.VAEBundle.create(
        vae_path=args.vae_path, scale_factor=args.scale_factor
    )
    classifier_metas, classifier_params = [], []
    if config.guidance.nn:
        cc = config.guidance.cond_fn.classifiers
        for i, (cls_model, cls_params) in enumerate(
            pipeline.build_classifier_bundles(
                cc, input_size=args.image_size, in_channels=args.in_channels,
            )
        ):
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
    gen_shape = (args.batch_size, args.in_channels,
                 args.image_size[0], args.image_size[1])

    # --- source excerpt ---------------------------------------------------
    source = getattr(config.edit, "source", None)
    l_start, l_end = config.edit.l_start, config.edit.l_end
    if source == "dataset":
        from rule_guided_music_tpu.data.datasets import load_data

        val_data = load_data(
            data_dir=args.data_dir + "_test_cls_" + str(args.class_label) + ".csv",
            batch_size=args.batch_size, class_cond=True,
            image_size=gen_shape[2] * 8, rule=None, prefetch=0,
        )
        gt, _ = next(val_data)
        gt = jnp.asarray(gt)
    else:
        midi = read_midi(source)
        roll = midi_to_roll(midi, fs=args.fs)
        gt = jnp.asarray(roll[None].astype(np.float32) / NORM_SCALE - 1.0)
        pad = gen_shape[2] * 8 - gt.shape[3]
        gt = jnp.pad(gt, ((0, 0), (0, 0), (0, 0), (0, max(pad, 0))),
                     constant_values=-1.0)[:, :, :, :gen_shape[2] * 8]
        gt = jnp.tile(gt, (args.batch_size, 1, 1, 1))

    from rule_guided_music_tpu.diffusion.latent import make_encode_fn

    encode_gt = jax.jit(
        lambda vp, x: make_encode_fn(
            lambda c: vae.model.apply(vp, c, method=type(vae.model).encode_moments),
            scale_factor=args.scale_factor,
        )(x)
    )
    gt_latent = encode_gt(vae.params, gt)
    mask = jnp.ones_like(gt_latent).at[:, :, l_start:l_end, :].set(0.0)

    gt_partial = gt[:, :, :, l_start * 8:l_end * 8]
    rng_np = np.random.default_rng(args.seed)
    rules = resolve_edit_targets(config, gt_partial, args.batch_size, rng_np,
                                 nd_bins_file=args.nd_bins_file)

    sampler_config = sampler_config_from_yaml(
        config, learn_sigma=args.learn_sigma, record=args.record,
        rule_names=list(rules.keys()),
    )

    y = (jnp.full((args.batch_size,), args.class_label, dtype=jnp.int32)
         if args.class_cond else None)
    save_dir = logger.get_dir()
    save_dir_gt = os.path.join(save_dir, "gt")
    os.makedirs(save_dir_gt, exist_ok=True)

    params_bundle = {
        "denoiser": denoiser.params,
        "vae": vae.params,
        "classifiers": tuple(classifier_params),
    }
    generate = pipeline.make_sample_fn(
        denoiser_model=denoiser.model,
        tables=tables,
        sampler_config=sampler_config,
        gen_shape=gen_shape,
        vae_model=vae.model,
        classifier_metas=classifier_metas,
        guidance_method=getattr(config.guidance, "method", "no_guidance"),
        use_decode=bool(config.guidance.vae),
        scale_factor=args.scale_factor,
        num_classes=args.num_classes,
        class_cond=args.class_cond,
        cfg=args.cfg,
        w=args.w,
    )
    decode_rolls = pipeline.make_decode_rolls_fn(vae.model, args.scale_factor)

    logger.log("sampling (edit)...")
    import pandas as pd

    all_results = pd.DataFrame()
    count, rng = 0, jax.random.PRNGKey(args.seed)
    while count < args.num_samples:
        rng, sub = jax.random.split(rng)
        latents, _ = generate(sub, params_bundle, rules, y,
                              edit_gt=gt_latent, edit_mask=mask)
        rolls = decode_rolls(vae.params, latents)
        arr = finalize_decoded_sample(np.asarray(rolls), BACKGROUND_THRESHOLD)
        arr_gt = finalize_decoded_sample(np.asarray(gt), threshold=-2.0)
        if args.save_files:
            yv = np.asarray(y) if y is not None else None
            save_piano_roll_midi(arr, save_dir, args.fs, y=yv, save_ind=count)
            save_piano_roll_midi(arr_gt, save_dir_gt, args.fs, y=yv,
                                 save_ind=count)
        generated = jnp.asarray(arr.astype(np.float32) / NORM_SCALE - 1.0)
        generated = generated[:, :, :, l_start * 8:l_end * 8]
        results = pipeline.eval_rule_loss(generated, rules)
        all_results = pd.concat([all_results, results], ignore_index=True)
        if args.save_files:
            all_results.to_csv(os.path.join(save_dir, "results.csv"), index=False)
        count += args.batch_size

    if args.save_files:
        loss_stats = pipeline.summarize_losses(all_results)
        loss_stats.to_csv(os.path.join(save_dir, "summary.csv"))
        print(loss_stats)
    logger.log("editing complete")


def create_argparser():
    defaults = dict(
        project="music-editing",
        dir="",
        data_dir="",
        config_path="",
        model="DiTRotary_XL_8",
        model_path="",
        vae="kl/f8-all-onset",
        vae_path="",
        clip_denoised=False,
        num_samples=16,
        batch_size=4,
        scale_factor=1.0,
        fs=100,
        num_classes=3,
        class_label=1,
        class_cond=True,
        cfg=False,
        w=4.0,
        record=False,
        save_files=True,
        seed=0,
        nd_bins_file="",
    )
    defaults.update(model_and_diffusion_defaults())
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


if __name__ == "__main__":
    main()
