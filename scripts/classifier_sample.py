"""Classic classifier-guided sampling (the reference's older path).

Re-architecture of scripts/classifier_sample.py: single rule classifier,
Sohl-Dickstein mean-shift guidance (xentropy or MSE cond_fn), no SCG.
The reference file has a stale import and is broken as-is (SURVEY.md §7);
this implements its intent on the current pipeline.
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
    model_and_diffusion_defaults,
)
from rule_guided_music_tpu.constants import BACKGROUND_THRESHOLD
from rule_guided_music_tpu.data.pianoroll import (
    finalize_decoded_sample,
    save_piano_roll_midi,
)
from rule_guided_music_tpu.diffusion import gaussian as gd
from rule_guided_music_tpu.diffusion.sampling import GuidanceConfig, SamplerConfig
from rule_guided_music_tpu.diffusion.schedule import make_schedule
from rule_guided_music_tpu.models import DiT_models
from rule_guided_music_tpu.pipeline import ClassifierSpecMeta, _init_on_host
from rule_guided_music_tpu.utils import logger


def main():
    args = create_argparser().parse_args()
    args.dir = args.dir or f"classifier_demo/{args.rule}_cls_{args.class_label}"
    logger.configure(args=args)

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

    cls_model = DiT_models[args.classifier_name](
        input_size=tuple(args.image_size), in_channels=args.in_channels,
        num_classes=args.classifier_num_classes, dtype=jnp.bfloat16,
    )
    x0 = jnp.zeros((1, args.in_channels, *args.image_size))
    cls_params = _init_on_host(
        cls_model.init, jax.random.PRNGKey(42), x0, jnp.zeros((1,))
    )
    if args.classifier_path and os.path.exists(args.classifier_path):
        cls_params = pipeline.load_checkpoint_params(
            args.classifier_path, target=cls_params
        )

    fn = "grad_nn_zt_xentropy" if args.xentropy else "grad_nn_zt_mse"
    metas = [ClassifierSpecMeta(fn=fn, rule_name=args.rule,
                                scale=args.classifier_scale, model=cls_model)]

    sampler_config = SamplerConfig(
        # --sampler dpmpp: few-step deterministic ODE sampling with the
        # eps-space classifier guidance shared with the DDIM branch
        sampler=args.sampler or ("ddim" if args.use_ddim else "ddpm"),
        eta=1.0,
        var_type=(gd.ModelVarType.LEARNED_RANGE if args.learn_sigma
                  else gd.ModelVarType.FIXED_LARGE),
        guidance=GuidanceConfig(method="classifier_guidance", schedule=False),
    )
    gen_shape = (args.batch_size, args.in_channels,
                 args.image_size[0], args.image_size[1])
    generate = pipeline.make_sample_fn(
        denoiser_model=denoiser.model, tables=tables,
        sampler_config=sampler_config, gen_shape=gen_shape,
        vae_model=vae.model, classifier_metas=metas,
        guidance_method="classifier_guidance", use_decode=False,
        scale_factor=args.scale_factor, num_classes=args.num_classes,
        class_cond=args.class_cond,
    )
    decode_rolls = pipeline.make_decode_rolls_fn(vae.model, args.scale_factor)
    bundle = {"denoiser": denoiser.params, "vae": vae.params,
              "classifiers": (cls_params,)}

    # target rule from flags: comma-separated values
    target = jnp.asarray([float(v) for v in args.target.split(",")])
    rules = {args.rule: jnp.tile(target[None], (args.batch_size, 1))}
    y = jnp.full((args.batch_size,), args.class_label, dtype=jnp.int32)

    save_dir = logger.get_dir()
    count, rng = 0, jax.random.PRNGKey(args.seed)
    import pandas as pd

    all_results = pd.DataFrame()
    while count < args.num_samples:
        rng, sub = jax.random.split(rng)
        latents, _ = generate(sub, bundle, rules, y)
        rolls = decode_rolls(vae.params, latents)
        arr = finalize_decoded_sample(np.asarray(rolls), BACKGROUND_THRESHOLD)
        save_piano_roll_midi(arr, save_dir, args.fs, y=np.asarray(y),
                             save_ind=count)
        generated = jnp.asarray(arr.astype(np.float32) / 63.5 - 1.0)
        results = pipeline.eval_rule_loss(generated, rules)
        all_results = pd.concat([all_results, results], ignore_index=True)
        all_results.to_csv(os.path.join(save_dir, "results.csv"), index=False)
        count += args.batch_size
    loss_stats = pipeline.summarize_losses(all_results)
    loss_stats.to_csv(os.path.join(save_dir, "summary.csv"))
    print(loss_stats)


def create_argparser():
    defaults = dict(
        project="music-classifier-sampling",
        dir="",
        model="DiTRotary_XL_8",
        model_path="",
        vae_path="",
        classifier_name="DiTRotary-S/8-cls",
        classifier_path="",
        classifier_num_classes=12,
        classifier_scale=400.0,
        rule="pitch_hist",
        target="1,0,0,0,0,0,0,0,0,0,0,0",
        xentropy=False,
        num_samples=16,
        batch_size=4,
        scale_factor=1.2465,
        fs=100,
        num_classes=3,
        class_label=1,
        class_cond=True,
        use_ddim=False,
        # '' = honor use_ddim; 'ddpm'|'ddim'|'dpmpp' overrides
        sampler="",
        seed=0,
    )
    defaults.update(model_and_diffusion_defaults())
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


if __name__ == "__main__":
    main()
