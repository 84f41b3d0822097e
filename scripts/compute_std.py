"""Compute latent std -> scale_factor over a dataset (reference compute_std.py).

scale_factor = 1 / std(encoder latents); released value 1.2465.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rule_guided_music_tpu.data.datasets import load_data
from rule_guided_music_tpu.pipeline import VAEBundle
from rule_guided_music_tpu.training.train_loop import get_kl_input


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--vae_path", default="")
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--num_batches", type=int, default=16)
    parser.add_argument("--image_size", type=int, default=1024)
    args = parser.parse_args()

    vae = VAEBundle.create(vae_path=args.vae_path, scale_factor=1.0)
    data = load_data(
        data_dir=args.data_dir, batch_size=args.batch_size,
        class_cond=False, deterministic=True, image_size=args.image_size,
        prefetch=0,
    )
    encode = jax.jit(
        lambda vp, batch: get_kl_input(
            lambda c: vae.model.apply(
                vp, c, method=type(vae.model).encode_moments
            ),
            batch, scale_factor=1.0, recombine=False,
        )
    )
    stds = []
    for _ in range(args.num_batches):
        batch, _ = next(data)
        z = encode(vae.params, jnp.asarray(batch))
        stds.append(float(jnp.std(z)))
    std = float(np.mean(stds))
    print(f"latent std: {std:.4f}  ->  scale_factor = {1.0 / std:.4f}")


if __name__ == "__main__":
    main()
