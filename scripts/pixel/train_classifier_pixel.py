"""Noise-aware rule-classifier training on pixel rolls (fs=12.5, no VAE).

Intent parity with the reference scripts/pixel/train_classifier_pixel.py:
rule labels computed in the data pipeline on pixel-resolution rolls
(``*_pixel`` rule variants), q_sample noising at random t, DiT classifier
on the (3, 128, 128) roll directly.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rule_guided_music_tpu.config import add_dict_to_argparser, diffusion_defaults
from rule_guided_music_tpu.data.datasets import load_data
from rule_guided_music_tpu.diffusion import gaussian as gd
from rule_guided_music_tpu.diffusion.schedule import make_schedule
from rule_guided_music_tpu.models import DiT_models
from rule_guided_music_tpu.pipeline import _init_on_host
from rule_guided_music_tpu.utils import logger


def main():
    from rule_guided_music_tpu.parallel.mesh import maybe_init_distributed

    maybe_init_distributed()   # RGM_MULTIHOST=1 on pod slices
    args = create_argparser().parse_args()
    logger.configure(args=args)

    chord = "chord" in args.rule
    model = DiT_models[args.classifier_name](
        input_size=tuple(args.image_size),
        in_channels=args.in_channels,
        num_classes=args.num_classes,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    x = jnp.zeros((1, args.in_channels, *args.image_size))
    t = jnp.zeros((1,))
    params = _init_on_host(model.init, jax.random.PRNGKey(args.seed), x, t)

    tables = make_schedule(args.noise_schedule, args.diffusion_steps).tables()
    data = load_data(
        data_dir=args.data_dir,
        batch_size=args.batch_size,
        class_cond=False,
        image_size=args.image_size[-1],
        rule=args.rule,
        shard=jax.process_index(),
        num_shards=jax.process_count(),
        seed=args.seed,
    )

    optimizer = optax.adamw(args.lr, weight_decay=args.weight_decay)
    opt_state = optimizer.init(params)

    def loss_fn(p, rolls, t, labels, rng):
        noise = jax.random.normal(rng, rolls.shape)
        x_t = gd.q_sample(tables, rolls, t, noise)
        model_t = tables.model_t[t]
        if chord:
            key_logits, chord_logits = model.apply(p, x_t, model_t)
            key_labels = labels["key"].astype(jnp.int32)
            chord_labels = labels["chord"].astype(jnp.int32)
            key_loss = optax.softmax_cross_entropy_with_integer_labels(
                key_logits, key_labels
            ).mean()
            chord_loss = optax.softmax_cross_entropy_with_integer_labels(
                chord_logits.reshape(-1, chord_logits.shape[-1]),
                chord_labels.reshape(-1),
            ).mean()
            loss = key_loss + chord_loss
            aux = {
                "key_loss": key_loss, "chord_loss": chord_loss,
                "key_acc": (key_logits.argmax(-1) == key_labels).mean(),
                "chord_acc": (chord_logits.argmax(-1) == chord_labels).mean(),
            }
        else:
            logits = model.apply(p, x_t, model_t)
            target = labels[args.rule].astype(jnp.float32)
            loss = ((logits - target) ** 2).sum(-1).mean()
            aux = {"mse": loss}
        return loss, aux

    @jax.jit
    def train_step(p, opt_state, rolls, t, labels, rng):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, rolls, t, labels, rng
        )
        updates, opt_state = optimizer.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        return p, opt_state, loss, aux

    rng_np = np.random.default_rng(args.seed)
    rng = jax.random.PRNGKey(args.seed)
    logger.log(f"training pixel classifier for rule '{args.rule}'...")
    for step in range(args.iterations):
        batch, cond = next(data)
        rolls = jnp.asarray(batch)
        labels = {k: jnp.asarray(np.asarray(v)) for k, v in cond.items()}
        max_t = (args.no_high_noise if args.no_high_noise > 0
                 else tables.num_timesteps)
        t = jnp.asarray(
            rng_np.integers(0, max_t, size=(rolls.shape[0],)),
            dtype=jnp.int32,
        )
        rng, sub = jax.random.split(rng)
        params, opt_state, loss, aux = train_step(
            params, opt_state, rolls, t, labels, sub
        )
        logger.logkv_mean("loss", float(loss))
        for k, v in aux.items():
            logger.logkv_mean(k, float(v))
        if step % args.log_interval == 0:
            logger.logkv("step", step)
            logger.dumpkvs()
        if step % args.save_interval == 0 and step > 0 and \
                jax.process_index() == 0:
            import orbax.checkpoint as ocp

            path = os.path.join(
                os.path.abspath(logger.get_dir()), "checkpoints",
                f"model{step:06d}",
            )
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(path, jax.device_get(params), force=True)
            ckptr.wait_until_finished()
            logger.log(f"saved {path}")


def create_argparser():
    defaults = dict(
        project="music-pixel-classifier",
        dir="",
        data_dir="",
        classifier_name="DiT-S/2-cls",
        rule="note_density_pixel",
        num_classes=16,
        iterations=10000,
        lr=3e-4,
        weight_decay=0.05,
        batch_size=32,
        image_size=[128, 128],
        in_channels=3,
        no_high_noise=0,
        log_interval=10,
        save_interval=5000,
        bf16=True,
        seed=0,
    )
    defaults.update(diffusion_defaults())
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


if __name__ == "__main__":
    main()
