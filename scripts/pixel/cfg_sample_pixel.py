"""Pixel-space class-conditional / CFG sampling -> MIDI (fs=12.5, no VAE).

Intent parity with the reference scripts/pixel/cfg_sample_pixel.py: sample
(3, 128, 128) rolls from a pixel-space denoiser with optional CFG
``(1+w) eps_c - w eps_null`` and write .midi files directly.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from rule_guided_music_tpu.config import add_dict_to_argparser, diffusion_defaults
from rule_guided_music_tpu.constants import BACKGROUND_THRESHOLD
from rule_guided_music_tpu.data.pianoroll import (
    finalize_decoded_sample,
    save_piano_roll_midi,
)
from rule_guided_music_tpu.diffusion.guidance import make_model_fn
from rule_guided_music_tpu.diffusion.sampling import SamplerConfig, sample_loop
from rule_guided_music_tpu.diffusion.schedule import make_schedule
from rule_guided_music_tpu.models import DiT_models
from rule_guided_music_tpu.pipeline import _init_on_host, load_checkpoint_params
from rule_guided_music_tpu.utils import logger


def main():
    args = create_argparser().parse_args()
    args.dir = args.dir or f"pixel_demo/cfg_w{args.w}_cls_{args.class_label}"
    logger.configure(args=args)

    model = DiT_models[args.model](
        input_size=tuple(args.image_size),
        in_channels=args.in_channels,
        num_classes=args.num_classes,
        learn_sigma=args.learn_sigma,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    x0 = jnp.zeros((1, args.in_channels, *args.image_size))
    params = _init_on_host(
        model.init,
        {"params": jax.random.PRNGKey(args.seed),
         "label_dropout": jax.random.PRNGKey(args.seed + 1)},
        x0, jnp.zeros((1,)), jnp.zeros((1,), dtype=jnp.int32), train=True,
    )
    if args.model_path:
        params = load_checkpoint_params(args.model_path, target=params)
    else:
        logger.log("WARNING: no model_path given — random denoiser weights")

    tables = make_schedule(
        args.noise_schedule, args.diffusion_steps,
        timestep_respacing=args.timestep_respacing,
    ).tables()
    # --sampler dpmpp: few-step deterministic ODE serving (docs/PERF.md)
    config = SamplerConfig(
        sampler=args.sampler or ("ddim" if args.use_ddim else "ddpm"),
        eta=1.0)
    gen_shape = (args.batch_size, args.in_channels, *args.image_size)
    y = jnp.full((args.batch_size,), args.class_label, dtype=jnp.int32)

    def generate(rng, p, y):
        model_fn = make_model_fn(
            lambda xx, tt, yy: model.apply(p, xx, tt, yy),
            num_classes=args.num_classes, class_cond=args.class_cond,
            cfg=args.cfg, w=args.w,
        )
        return sample_loop(rng, model_fn, gen_shape, tables, config, y=y)

    generate = jax.jit(generate)
    save_dir = logger.get_dir()
    count, rng = 0, jax.random.PRNGKey(args.seed)
    while count < args.num_samples:
        rng, sub = jax.random.split(rng)
        rolls, _ = generate(sub, params, y)
        arr = finalize_decoded_sample(np.asarray(rolls), BACKGROUND_THRESHOLD)
        save_piano_roll_midi(arr, save_dir, args.fs, y=np.asarray(y),
                             save_ind=count)
        count += args.batch_size
        logger.log(f"created {count} pixel samples")
    logger.log("sampling complete")


def create_argparser():
    defaults = dict(
        project="music-pixel-cfg",
        dir="",
        model="DiT-B/8",
        model_path="",
        num_samples=4,
        batch_size=2,
        fs=12.5,
        image_size=[128, 128],
        in_channels=3,
        num_classes=3,
        class_label=1,
        class_cond=True,
        cfg=True,
        w=4.0,
        use_ddim=False,
        # '' = honor use_ddim; 'ddpm'|'ddim'|'dpmpp' overrides
        sampler="",
        bf16=True,
        seed=0,
    )
    defaults.update(diffusion_defaults())
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


if __name__ == "__main__":
    main()
