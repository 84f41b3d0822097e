"""Unguided long-form generation via DiffCollage score stitching.

Re-architecture of the reference scripts/diffcollage_sample.py:27-170:
CondIndCircle/Simple stitched epsilon over overlapping 128-column latent
windows, whole chain in one scan, decoded to one long MIDI per sample.
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
from rule_guided_music_tpu.diffusion.collage import circle_length, linear_length
from rule_guided_music_tpu.diffusion.sampling import SamplerConfig
from rule_guided_music_tpu.diffusion.schedule import make_schedule
from rule_guided_music_tpu.utils import logger


def main():
    args = create_argparser().parse_args()
    args.dir = args.dir or f"dc_demo/{args.dc_type}_n{args.num_img}"
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

    circle = args.dc_type == "circle"
    t_long = (circle_length(args.num_img, args.overlap_size) if circle
              else linear_length(args.num_img, args.overlap_size))
    gen_shape = (args.batch_size, args.in_channels, t_long, args.image_size[1])

    sampler_config = SamplerConfig(
        sampler="ddim" if args.use_ddim else "ddpm",
        eta=1.0,
        var_type=(gd.ModelVarType.LEARNED_RANGE if args.learn_sigma
                  else gd.ModelVarType.FIXED_LARGE),
    )
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
        collage=dict(num_img=args.num_img, overlap=args.overlap_size,
                     circle=circle),
    )
    decode_rolls = pipeline.make_decode_rolls_fn(vae.model, args.scale_factor)
    bundle = {"denoiser": denoiser.params, "vae": vae.params, "classifiers": ()}
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
        logger.log(f"created {count} long samples ({t_long * 8 / args.fs:.1f}s each)")
    logger.log("sampling complete")


def create_argparser():
    defaults = dict(
        project="music-diffcollage",
        dir="",
        model="DiTRotary_XL_8",
        model_path="",
        vae_path="",
        num_samples=4,
        batch_size=2,
        scale_factor=1.2465,
        fs=100,
        num_classes=3,
        class_label=1,
        class_cond=True,
        cfg=False,
        w=4.0,
        use_ddim=False,
        dc_type="circle",
        num_img=3,
        overlap_size=64,
        seed=0,
    )
    defaults.update(model_and_diffusion_defaults())
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


if __name__ == "__main__":
    main()
