"""Latent DiT training CLI (reference: scripts/train_dit.py).

Defaults mirror the reference: DiTRotary_XL_8 on (128, 16) latents, lr 1e-4,
EMA 0.9999, encode_rep 4 (shifted-window latent recombination from 25.6 s
rolls), class-conditional on 3 dataset labels. Data parallelism comes from
the device mesh; run the same command on every host of a pod slice.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rule_guided_music_tpu.config import add_dict_to_argparser, diffusion_defaults
from rule_guided_music_tpu.data.datasets import load_data
from rule_guided_music_tpu.diffusion import gaussian as gd
from rule_guided_music_tpu.diffusion.schedule import make_schedule
from rule_guided_music_tpu.models import DiT_models
from rule_guided_music_tpu.pipeline import VAEBundle
from rule_guided_music_tpu.training.resample import create_named_schedule_sampler
from rule_guided_music_tpu.training.train_loop import (
    TrainConfig,
    TrainLoop,
    make_eval_sampling_fn,
)
from rule_guided_music_tpu.utils import logger


def build_mesh(args):
    """('data','fsdp','model') mesh over all devices when >1 are visible or
    sharded axes were requested; None keeps the single-device fast path.
    `--dp 0` (default) absorbs the remaining devices into the data axis.

    Auto mode (no explicit --dp/--fsdp/--tp) must never reject a config the
    single-device path would accept: when the global batch does not divide
    over all visible devices (e.g. a 4-excerpt smoke batch on the 8-device
    virtual test mesh), it data-parallelizes over the largest device prefix
    whose size divides the batch instead of asserting.
    """
    from rule_guided_music_tpu.parallel.mesh import make_mesh

    explicit = args.dp > 0 or args.fsdp > 1 or args.tp > 1
    n = jax.device_count()
    if n == 1 and not explicit:
        return None
    if not explicit:
        use = max(d for d in range(1, n + 1) if args.batch_size % d == 0)
        if use == 1:
            logger.log(f"build_mesh: batch_size {args.batch_size} has no "
                       f"divisor <= {n} devices > 1; single-device run")
            return None
        if use < n:
            logger.log(f"build_mesh: batch_size {args.batch_size} not "
                       f"divisible by {n} devices; data-parallel over "
                       f"{use} of them")
        return make_mesh(dp=use, devices=jax.devices()[:use])
    mesh = make_mesh(dp=args.dp or None, fsdp=args.fsdp, tp=args.tp)
    batch_span = mesh.shape["data"] * mesh.shape["fsdp"]
    assert args.batch_size % batch_span == 0, (
        f"global batch_size ({args.batch_size}) must be divisible by the "
        f"batch-sharded mesh extent data*fsdp = {batch_span}")
    return mesh


def main():
    from rule_guided_music_tpu.parallel.mesh import maybe_init_distributed

    maybe_init_distributed()   # RGM_MULTIHOST=1 on pod slices
    args = create_argparser().parse_args()
    logger.configure(args=args)
    logger.log("creating model and diffusion...")

    model = DiT_models[args.model](
        input_size=tuple(args.image_size),
        in_channels=args.in_channels,
        num_classes=args.num_classes,
        learn_sigma=args.learn_sigma,
        class_dropout_prob=args.class_dropout_prob,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        remat=args.remat,
    )
    x = jnp.zeros((1, args.in_channels, *args.image_size))
    t = jnp.zeros((1,))
    y = jnp.zeros((1,), dtype=jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(args.seed),
         "label_dropout": jax.random.PRNGKey(args.seed + 1)},
        x, t, y, train=True,
    )
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    logger.log(f"model {args.model}: {n_params/1e6:.1f}M params")

    schedule = make_schedule(args.noise_schedule, args.diffusion_steps)
    tables = schedule.tables()

    vae_arch = None
    if args.vae_arch:
        import json

        vae_arch = json.loads(args.vae_arch)
    vae = VAEBundle.create(vae_path=args.vae_path,
                           scale_factor=args.scale_factor, arch=vae_arch)

    assert args.batch_size >= args.encode_rep and \
        args.batch_size % args.encode_rep == 0, (
        f"batch_size ({args.batch_size}) must be a positive multiple of "
        f"encode_rep ({args.encode_rep}): the loader yields "
        f"batch_size/encode_rep rolls, each re-chunked into encode_rep "
        f"training windows (train_util.py:403-429)")
    data = load_data(
        data_dir=args.data_dir,
        batch_size=args.batch_size // args.encode_rep,
        class_cond=args.class_cond,
        image_size=args.pr_image_size,
        shard=jax.process_index(),
        num_shards=jax.process_count(),
        seed=args.seed,
    )

    # held-out set for the EMA eval loss (reference train_dit.py:74-79
    # loads data_dir+"_test.csv" unconditionally; here opt-in by flag)
    eval_data = None
    if args.eval_data_dir:
        eval_data = load_data(
            data_dir=args.eval_data_dir,
            batch_size=args.batch_size // args.encode_rep,
            class_cond=args.class_cond,
            image_size=args.pr_image_size,
            shard=jax.process_index(),
            num_shards=jax.process_count(),
            seed=args.seed + 1,
        )

    config = TrainConfig(
        lr=args.lr,
        optimizer=args.optimizer,
        ema_dtype=args.ema_dtype,
        weight_decay=args.weight_decay,
        lr_anneal_steps=args.lr_anneal_steps,
        ema_rate=float(args.ema_rate),
        microbatch=args.microbatch,
        encode_rep=args.encode_rep,
        shift_size=args.shift_size,
        scale_factor=args.scale_factor,
        log_interval=args.log_interval,
        save_interval=args.save_interval,
        keep_checkpoints=args.keep_checkpoints,
        eval_interval=args.eval_interval,
        profile_step=args.profile_step,
        var_type=(gd.ModelVarType.LEARNED_RANGE if args.learn_sigma
                  else gd.ModelVarType.FIXED_LARGE),
        loss_type=(gd.LossType.RESCALED_MSE if args.learn_sigma
                   else gd.LossType.MSE),
    )

    def model_apply(p, x, model_t, y, rng):
        return model.apply(p, x, model_t, y, train=True,
                           rngs={"label_dropout": rng})

    eval_fn = None
    if args.eval_interval > 0:
        eval_fn = make_eval_sampling_fn(
            lambda p, x, t, y: model.apply(p, x, t, y),
            tables,
            vae_model=vae.model,
            sample_batch_size=args.eval_sample_batch_size,
            num_classes=args.num_classes if args.class_cond else 0,
            in_channels=args.in_channels,
            image_size=tuple(args.image_size),
            fs=args.fs,
            scale_factor=args.scale_factor,
        )

    loop = TrainLoop(
        model_apply=model_apply,
        init_params=params,
        tables=tables,
        data=data,
        config=config,
        vae_encode=lambda vp, chunks: vae.model.apply(
            vp, chunks, method=type(vae.model).encode_moments
        ),
        vae_params=vae.params,
        schedule_sampler=create_named_schedule_sampler(
            args.schedule_sampler, tables.num_timesteps
        ),
        checkpoint_dir=os.path.join(logger.get_dir(), "checkpoints"),
        eval_fn=eval_fn,
        eval_data=eval_data,
        mesh=build_mesh(args),
        seed=args.seed,
    )
    if args.resume_checkpoint:
        loop.restore(args.resume_checkpoint)
    elif args.resume:
        latest = TrainLoop.latest_checkpoint(
            os.path.join(logger.get_dir(), "checkpoints")
        )
        if latest:
            loop.restore(latest)

    logger.log("training...")
    loop.run_loop(max_steps=args.max_steps if args.max_steps > 0 else None)


def create_argparser():
    defaults = dict(
        project="music-diffusion",
        dir="",
        data_dir="",
        eval_data_dir="",
        model="DiTRotary_XL_8",
        schedule_sampler="uniform",
        lr=1e-4,
        weight_decay=0.0,
        lr_anneal_steps=0,
        batch_size=32,
        microbatch=-1,
        ema_rate="0.9999",
        log_interval=10,
        save_interval=10000,
        keep_checkpoints=0,
        eval_interval=-1,
        eval_sample_batch_size=16,
        resume_checkpoint="",
        resume=False,
        image_size=[128, 16],
        in_channels=4,
        num_classes=3,
        class_cond=True,
        class_dropout_prob=0.1,
        vae_path="",
        # JSON AutoencoderKL geometry overrides ('' = production f8)
        vae_arch="",
        scale_factor=1.2465,
        pr_image_size=2560,
        encode_rep=4,
        shift_size=4,
        # accepted for reference-CLI parity; the jit'd encoder handles the
        # whole batch (XLA tiles it), so no explicit encode microbatching
        microbatch_encode=-1,
        embed_model_name="kl/f8-all-onset",
        fs=100,
        bf16=True,
        seed=0,
        max_steps=-1,
        profile_step=-1,
        remat=False,
        optimizer="adamw",
        ema_dtype="float32",
        # mesh factorization: dp=0 -> absorb remaining devices into 'data'
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
