"""Pixel-space sampling with the UNet denoiser (no VAE; fs=12.5).

Counterpart of the reference's pixel-space sampling configs: the roll IS the
diffusion state (3, 128, 128), rules use the *_pixel variants (interval 16,
chord window at fs=12.5).
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
from rule_guided_music_tpu.diffusion import gaussian as gd
from rule_guided_music_tpu.diffusion.sampling import (
    GuidanceConfig,
    SCGConfig,
    SamplerConfig,
    sample_loop,
)
from rule_guided_music_tpu.diffusion.schedule import make_schedule
from rule_guided_music_tpu.models.unet import UNetModel
from rule_guided_music_tpu.pipeline import _init_on_host, load_checkpoint_params
from rule_guided_music_tpu.utils import logger


def main():
    args = create_argparser().parse_args()
    args.dir = args.dir or "pixel_demo/sample"
    logger.configure(args=args)

    model = UNetModel(
        in_channels=args.in_channels,
        model_channels=args.num_channels,
        out_channels=args.in_channels,
        num_res_blocks=args.num_res_blocks,
        attention_resolutions=tuple(
            args.image_size[-1] // int(r)
            for r in args.attention_resolutions.split(",")
        ),
        num_classes=args.num_classes if args.class_cond else None,
        dtype=jnp.bfloat16,
    )
    x0 = jnp.zeros((1, args.in_channels, *args.image_size))
    params = _init_on_host(
        model.init, jax.random.PRNGKey(0), x0, jnp.zeros((1,)),
        jnp.zeros((1,), dtype=jnp.int32) if args.class_cond else None,
    )
    if args.model_path:
        params = load_checkpoint_params(args.model_path, target=params)

    tables = make_schedule(
        args.noise_schedule, args.diffusion_steps,
        timestep_respacing=args.timestep_respacing,
    ).tables()

    scg = None
    rules = {}
    if args.scg:
        rules["note_density_pixel"] = jnp.full(
            (args.batch_size, 2 * args.image_size[-1] // 16), 2.0
        )
        scg = SCGConfig(num_samples=args.scg_k,
                        weights=(("note_density_pixel", 1.0),))
    cfg = SamplerConfig(
        sampler="ddpm",
        guidance=GuidanceConfig(method="no_guidance", schedule=True,
                                t_start=tables.num_timesteps, t_end=0)
        if args.scg else None,
        scg=scg,
    )
    gen_shape = (args.batch_size, args.in_channels, *args.image_size)
    y = (jnp.full((args.batch_size,), args.class_label, dtype=jnp.int32)
         if args.class_cond else None)

    def generate(rng, p, rules, y):
        model_fn = lambda x, t, yy: model.apply(p, x, t, yy)
        # pixel space: the state is already a roll; decode is identity
        return sample_loop(rng, model_fn, gen_shape, tables, cfg,
                           y=y, rules=rules,
                           decode_fn=(lambda v: v) if args.scg else None)

    generate = jax.jit(generate)
    save_dir = logger.get_dir()
    count, rng = 0, jax.random.PRNGKey(args.seed)
    while count < args.num_samples:
        rng, sub = jax.random.split(rng)
        rolls, _ = generate(sub, params, rules, y)
        arr = finalize_decoded_sample(np.asarray(rolls), BACKGROUND_THRESHOLD)
        save_piano_roll_midi(
            arr, save_dir, args.fs,
            y=np.asarray(y) if y is not None else None, save_ind=count,
        )
        count += args.batch_size
        logger.log(f"created {count} pixel samples")
    logger.log("sampling complete")


def create_argparser():
    defaults = dict(
        project="music-pixel-sampling",
        dir="",
        model_path="",
        num_samples=4,
        batch_size=2,
        fs=12.5,
        image_size=[128, 128],
        in_channels=3,
        num_channels=128,
        num_res_blocks=2,
        attention_resolutions="32,16,8",
        num_classes=3,
        class_label=1,
        class_cond=True,
        scg=False,
        scg_k=4,
        seed=0,
    )
    defaults.update(diffusion_defaults())
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


if __name__ == "__main__":
    main()
