"""KL-VAE training CLI over 1.28 s piano-roll chunks.

Re-architecture of taming/main.py's Lightning CLI for the
configs/pr/kl/f8-all-onset.yaml recipe: AutoencoderKL (f8, embed 4),
L1 + 1e-2 KL, optional patch-GAN (off in the released config), batch 128
of (3, 128, 128) chunks normalized to [-1, 1].
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rule_guided_music_tpu.constants import NORM_SCALE
from rule_guided_music_tpu.models import AutoencoderKL
from rule_guided_music_tpu.pipeline import _init_on_host
from rule_guided_music_tpu.training.vae_train import (
    NLayerDiscriminator,
    VAETrainConfig,
    make_vae_train_steps,
)
from rule_guided_music_tpu.utils import logger


def chunk_batches(chunk_dir, batch_size, seed=0):
    files = sorted(glob.glob(os.path.join(chunk_dir, "*.npy")))
    if not files:
        raise SystemExit(f"no .npy chunks in {chunk_dir}")
    rng = np.random.default_rng(seed)
    while True:
        rng.shuffle(files)
        for i in range(0, len(files) - batch_size + 1, batch_size):
            batch = np.stack([np.load(f) for f in files[i:i + batch_size]])
            yield jnp.asarray(batch.astype(np.float32) / NORM_SCALE - 1.0)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--chunk_dir", required=True)
    parser.add_argument("--dir", default="vae_train")
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--base_lr", type=float, default=4.5e-6)
    parser.add_argument("--kl_weight", type=float, default=1e-2)
    parser.add_argument("--disc_weight", type=float, default=0.0)
    parser.add_argument("--perceptual_weight", type=float, default=0.0)
    parser.add_argument("--lpips_vgg_path", default="",
                        help="torch VGG16 features .pt for the LPIPS term")
    parser.add_argument("--lpips_lins_path", default="",
                        help="taming vgg.pth linear heads for LPIPS")
    parser.add_argument("--iterations", type=int, default=100000)
    parser.add_argument("--log_interval", type=int, default=50)
    parser.add_argument("--save_interval", type=int, default=5000)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    logger.configure(args=args)

    vae = AutoencoderKL(dtype=jnp.bfloat16)
    params = _init_on_host(
        vae.init, jax.random.PRNGKey(args.seed),
        jnp.zeros((1, 3, 128, 128)), rng=jax.random.PRNGKey(args.seed + 1),
    )
    config = VAETrainConfig(
        lr=args.base_lr * args.batch_size,
        kl_weight=args.kl_weight,
        disc_weight=args.disc_weight,
        perceptual_weight=args.perceptual_weight,
    )
    disc = NLayerDiscriminator() if args.disc_weight > 0 else None
    lpips = lpips_params = None
    if args.perceptual_weight > 0:
        import jax as _jax

        from rule_guided_music_tpu.training.perceptual import (
            LPIPS,
            convert_torch_lpips,
        )

        lpips = LPIPS()
        if args.lpips_vgg_path and args.lpips_lins_path:
            from rule_guided_music_tpu.models.torch_port import (
                load_torch_state_dict,
            )

            lpips_params = _jax.tree_util.tree_map(
                jnp.asarray,
                convert_torch_lpips(
                    load_torch_state_dict(args.lpips_vgg_path),
                    load_torch_state_dict(args.lpips_lins_path),
                ),
            )
        else:
            logger.log("WARNING: perceptual term with random LPIPS weights "
                       "(pass --lpips_vgg_path/--lpips_lins_path)")
            x0 = jnp.zeros((1, 3, 128, 128))
            lpips_params = _init_on_host(
                lpips.init, _jax.random.PRNGKey(7), x0, x0)
    disc_params = (
        _init_on_host(disc.init, jax.random.PRNGKey(7),
                      jnp.zeros((1, 3, 128, 128)))
        if disc is not None else None
    )
    ae_opt, disc_opt, ae_step, disc_step = make_vae_train_steps(
        vae, config, disc, lpips=lpips
    )
    opt_state = ae_opt.init(params)
    disc_opt_state = disc_opt.init(disc_params) if disc is not None else None

    data = chunk_batches(args.chunk_dir, args.batch_size, args.seed)
    rng = jax.random.PRNGKey(args.seed + 2)
    for step in range(args.iterations):
        batch = next(data)
        rng, sub = jax.random.split(rng)
        params, opt_state, aux = ae_step(
            params, opt_state, disc_params, batch, sub, jnp.int32(step),
            lpips_params,
        )
        if disc_step is not None and step >= config.disc_start:
            rng, sub = jax.random.split(rng)
            disc_params, disc_opt_state, d_aux = disc_step(
                disc_params, disc_opt_state, params, batch, sub
            )
            aux.update(d_aux)
        for k, v in aux.items():
            logger.logkv_mean(k, float(v))
        if step % args.log_interval == 0:
            logger.logkv("step", step)
            logger.dumpkvs()
        if step % args.save_interval == 0 and step > 0 and \
                jax.process_index() == 0:
            import orbax.checkpoint as ocp

            path = os.path.join(os.path.abspath(logger.get_dir()),
                                "checkpoints", f"vae{step:06d}")
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(path, jax.device_get(params), force=True)
            ckptr.wait_until_finished()
            logger.log(f"saved {path}")


if __name__ == "__main__":
    main()
