"""Plain class-conditional / classifier-free-guidance sampling -> MIDI.

Re-architecture of the reference scripts/cfg_sample.py:26-160: no rules,
no SCG — just the (optionally CFG-weighted) class-conditional denoiser and
the VAE decode, written out as .midi files.
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
from rule_guided_music_tpu.diffusion.sampling import SamplerConfig
from rule_guided_music_tpu.diffusion.schedule import make_schedule
from rule_guided_music_tpu.utils import logger


def main():
    args = create_argparser().parse_args()
    args.dir = args.dir or f"cfg_demo/w{args.w}_cls_{args.class_label}"
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

    sampler_config = SamplerConfig(
        # --sampler dpmpp: deterministic DPM-Solver++(2M) ODE sampler for
        # few-step unguided/CFG serving (beyond-reference; docs/PERF.md)
        sampler=args.sampler or ("ddim" if args.use_ddim else "ddpm"),
        eta=1.0,
        var_type=(gd.ModelVarType.LEARNED_RANGE if args.learn_sigma
                  else gd.ModelVarType.FIXED_LARGE),
        clip_denoised=args.clip_denoised,
    )
    gen_shape = (args.batch_size, args.in_channels,
                 args.image_size[0], args.image_size[1])
    generate = pipeline.make_sample_fn(
        denoiser_model=denoiser.model,
        tables=tables,
        sampler_config=sampler_config,
        gen_shape=gen_shape,
        vae_model=vae.model,
        use_decode=False,
        scale_factor=args.scale_factor,
        num_classes=args.num_classes,
        class_cond=args.class_cond,
        cfg=args.cfg,
        w=args.w,
    )
    decode_rolls = pipeline.make_decode_rolls_fn(vae.model, args.scale_factor)
    bundle = {"denoiser": denoiser.params, "vae": vae.params,
              "classifiers": ()}
    y = jnp.full((args.batch_size,), args.class_label, dtype=jnp.int32)

    save_dir = logger.get_dir()
    count, rng = 0, jax.random.PRNGKey(args.seed)
    while count < args.num_samples:
        rng, sub = jax.random.split(rng)
        latents, _ = generate(sub, bundle, {}, y)
        rolls = decode_rolls(vae.params, latents)
        arr = finalize_decoded_sample(np.asarray(rolls), BACKGROUND_THRESHOLD)
        save_piano_roll_midi(arr, save_dir, args.fs, y=np.asarray(y),
                             save_ind=count)
        count += args.batch_size
        logger.log(f"created {count} samples")
    logger.log("sampling complete")


def create_argparser():
    defaults = dict(
        project="music-cfg-sampling",
        dir="",
        model="DiTRotary_XL_8",
        model_path="",
        vae_path="",
        clip_denoised=False,
        num_samples=16,
        batch_size=4,
        scale_factor=1.2465,
        fs=100,
        num_classes=3,
        class_label=1,
        class_cond=True,
        cfg=True,
        w=4.0,
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
