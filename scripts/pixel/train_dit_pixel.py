"""Pixel-space DiT diffusion training (fs=12.5, 128x128 rolls, no VAE).

The reference's scripts/pixel/train_dit_pixel.py imports a nonexistent
``music_score_sde`` module and is broken as-is (SURVEY.md §7 quirks); this
implements its intent: train a 2-D-patchified DiT directly on piano-roll
pixels through the production TrainLoop (no latent encode step).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

from scripts.train_dit import build_mesh
from rule_guided_music_tpu.config import add_dict_to_argparser, diffusion_defaults
from rule_guided_music_tpu.data.datasets import load_data
from rule_guided_music_tpu.diffusion import gaussian as gd
from rule_guided_music_tpu.diffusion.schedule import make_schedule
from rule_guided_music_tpu.models import DiT_models
from rule_guided_music_tpu.pipeline import _init_on_host
from rule_guided_music_tpu.training.resample import create_named_schedule_sampler
from rule_guided_music_tpu.training.train_loop import TrainConfig, TrainLoop
from rule_guided_music_tpu.utils import logger


def main():
    from rule_guided_music_tpu.parallel.mesh import maybe_init_distributed

    maybe_init_distributed()   # RGM_MULTIHOST=1 on pod slices
    args = create_argparser().parse_args()
    logger.configure(args=args)

    model = DiT_models[args.model](
        input_size=tuple(args.image_size),
        in_channels=args.in_channels,
        num_classes=args.num_classes if args.class_cond else 0,
        class_dropout_prob=args.class_dropout_prob,
        learn_sigma=args.learn_sigma,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    x = jnp.zeros((1, args.in_channels, *args.image_size))
    t = jnp.zeros((1,))
    y = jnp.zeros((1,), dtype=jnp.int32) if args.class_cond else None
    params = _init_on_host(
        model.init,
        {"params": jax.random.PRNGKey(args.seed),
         "label_dropout": jax.random.PRNGKey(args.seed + 1)},
        x, t, y, train=True,
    )
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    logger.log(f"pixel DiT {args.model}: {n_params/1e6:.1f}M params")

    tables = make_schedule(args.noise_schedule, args.diffusion_steps).tables()
    data = load_data(
        data_dir=args.data_dir,
        batch_size=args.batch_size,
        class_cond=args.class_cond,
        image_size=args.image_size[-1],
        shard=jax.process_index(),
        num_shards=jax.process_count(),
        seed=args.seed,
    )
    config = TrainConfig(
        lr=args.lr, weight_decay=args.weight_decay,
        lr_anneal_steps=args.lr_anneal_steps,
        ema_rate=float(args.ema_rate), microbatch=args.microbatch,
        encode_rep=1,
        log_interval=args.log_interval, save_interval=args.save_interval,
        var_type=(gd.ModelVarType.LEARNED_RANGE if args.learn_sigma
                  else gd.ModelVarType.FIXED_LARGE),
        loss_type=(gd.LossType.RESCALED_MSE if args.learn_sigma
                   else gd.LossType.MSE),
    )

    def model_apply(p, x, model_t, y, rng):
        return model.apply(p, x, model_t, y, train=True,
                           rngs={"label_dropout": rng})

    loop = TrainLoop(
        model_apply=model_apply,
        init_params=params,
        tables=tables,
        data=data,
        config=config,
        schedule_sampler=create_named_schedule_sampler(
            args.schedule_sampler, tables.num_timesteps
        ),
        checkpoint_dir=os.path.join(logger.get_dir(), "checkpoints"),
        mesh=build_mesh(args),
        seed=args.seed,
    )
    if args.resume:
        latest = TrainLoop.latest_checkpoint(
            os.path.join(logger.get_dir(), "checkpoints")
        )
        if latest:
            loop.restore(latest)
    logger.log("training pixel-space DiT...")
    loop.run_loop(max_steps=args.max_steps if args.max_steps > 0 else None)


def create_argparser():
    defaults = dict(
        project="music-pixel-diffusion",
        dir="",
        data_dir="",
        model="DiT-B/8",
        schedule_sampler="uniform",
        lr=1e-4,
        weight_decay=0.0,
        lr_anneal_steps=0,
        batch_size=16,
        microbatch=-1,
        ema_rate="0.9999",
        log_interval=10,
        save_interval=10000,
        image_size=[128, 128],
        in_channels=3,
        num_classes=3,
        class_cond=True,
        class_dropout_prob=0.1,
        bf16=True,
        resume=False,
        seed=0,
        max_steps=-1,
        dp=0,
        fsdp=1,
        tp=1,
    )
    defaults.update(diffusion_defaults())
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


if __name__ == "__main__":
    main()
