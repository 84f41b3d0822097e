"""Distill a reduced-width scoring decoder for SCG candidate selection.

VERDICT r1 item 6 / docs/PERF.md: the guided SCG step is ~75% VAE decode,
and all of that decode exists only to *rank* k candidates by rule loss.
This trains a narrower decoder (default ch=64, ~4x fewer conv FLOPs than
the full ch=128) to match the full decoder's outputs on latents drawn from
the sampler's operating distribution, then measures what actually matters:

  * rule-loss agreement (per-rule MSE between light- and full-decoded
    rule vectors), and
  * SCG selection agreement — the fraction of (B, k)-candidate groups
    where both decoders pick the same argmax candidate.

Saves the scoring decoder params as an .npz (utils.fixtures layout) for
pipeline.make_sample_fn(scoring_vae_model=...) + params["scoring_vae"].
Use --vae_path to distill against real VAE weights; without it the teacher
is the random-init VAE (still a valid perf/agreement measurement — the
bench uses the same weights).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rule_guided_music_tpu.models import AutoencoderKL, ScoringDecoder
from rule_guided_music_tpu.pipeline import _init_on_host, load_checkpoint_params
from rule_guided_music_tpu.rules.registry import FUNC_DICT, LOSS_DICT
from rule_guided_music_tpu.utils.fixtures import flatten_tree


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--vae_path", default="")
    parser.add_argument("--teacher_ch", type=int, default=128,
                        help="teacher VAE width (reduce for CPU smoke tests)")
    parser.add_argument("--ch", type=int, default=64)
    parser.add_argument("--steps", type=int, default=400)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--lr", type=float, default=2e-3)
    # deployment feeds the scoring decoder x0 / scale_factor
    # (make_decode_fn divides before decode), so the operating input std is
    # ~1/1.2465 — distill and measure agreement there by default
    parser.add_argument("--latent_std", type=float, default=1.0 / 1.2465,
                        help="std of the decoder-input latent dist "
                             "(default 1/scale_factor = deployment point)")
    parser.add_argument("--agree_groups", type=int, default=32,
                        help="(B,k) groups for selection-agreement eval")
    parser.add_argument("--k", type=int, default=16)
    parser.add_argument("--out", default="loggings/scoring_decoder/ch{ch}.npz")
    parser.add_argument("--bf16", type=lambda s: s.lower() != "false",
                        default=True)
    parser.add_argument("--save_dtype", default="float32",
                        choices=["float32", "float16"])
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    full = AutoencoderKL(ch=args.teacher_ch, dtype=dtype)
    full_params = _init_on_host(
        full.init, jax.random.PRNGKey(1), jnp.zeros((1, 3, 128, 128)),
        rng=jax.random.PRNGKey(2),
    )
    if args.vae_path:
        full_params = load_checkpoint_params(args.vae_path,
                                             target=full_params)
        print(f"teacher: {args.vae_path}")
    else:
        print("teacher: random-init VAE (no --vae_path)")

    light = ScoringDecoder(ch=args.ch, dtype=dtype)
    light_params = _init_on_host(
        light.init, jax.random.PRNGKey(3), jnp.zeros((1, 4, 16, 16)),
    )
    n_light = sum(p.size for p in jax.tree_util.tree_leaves(light_params))
    n_full_dec = sum(
        p.size for p in jax.tree_util.tree_leaves(full_params["params"]["decoder"])
    )
    print(f"light decoder ch={args.ch}: {n_light/1e6:.1f}M params "
          f"(full decoder: {n_full_dec/1e6:.1f}M)")

    teacher = jax.jit(lambda fp, z: full.apply(
        fp, z, method=AutoencoderKL.decode))
    opt = optax.adam(args.lr)
    opt_state = opt.init(light_params)

    def loss_fn(p, z, target):
        rec = light.apply(p, z, method=ScoringDecoder.decode)
        return jnp.abs(rec - target).mean()

    @jax.jit
    def step(p, s, z, target):
        loss, grads = jax.value_and_grad(loss_fn)(p, z, target)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    rng = jax.random.PRNGKey(args.seed)
    t0 = time.perf_counter()
    for i in range(args.steps):
        rng, sub = jax.random.split(rng)
        z = jax.random.normal(sub, (args.batch, 4, 16, 16)) * args.latent_std
        target = teacher(full_params, z)
        light_params, opt_state, loss = step(light_params, opt_state, z,
                                             target)
        if i % 50 == 0:
            print(f"distill step {i}: L1 {float(loss):.4f} "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)

    # --- agreement metrics --------------------------------------------------
    def decode_long(apply_fn, p, z_img):
        # (N, 4, 128, 16) latent image -> (N, 3, 128, 1024) roll
        from rule_guided_music_tpu.diffusion.latent import make_decode_fn

        return make_decode_fn(lambda c: apply_fn(p, c))(z_img)

    full_apply = lambda p, c: full.apply(p, c, method=AutoencoderKL.decode)
    light_apply = lambda p, c: light.apply(p, c,
                                           method=ScoringDecoder.decode)

    rules = ["pitch_hist", "note_density"]
    agree = 0
    rule_mse = {r: [] for r in rules}

    @jax.jit
    def group_losses(fp, lp, z_img, target_ph, target_nd):
        roll_f = decode_long(full_apply, fp, z_img)
        roll_l = decode_long(light_apply, lp, z_img)
        out = {}
        for name, tgt in [("pitch_hist", target_ph),
                          ("note_density", target_nd)]:
            vf = FUNC_DICT[name](roll_f)
            vl = FUNC_DICT[name](roll_l)
            out[f"{name}_f"] = ((vf - tgt) ** 2).mean(axis=-1)
            out[f"{name}_l"] = ((vl - tgt) ** 2).mean(axis=-1)
            out[f"{name}_mse"] = ((vf - vl) ** 2).mean()
        return out

    for g in range(args.agree_groups):
        rng, s1, s2, s3 = jax.random.split(rng, 4)
        z_img = jax.random.normal(s1, (args.k, 4, 128, 16)) * args.latent_std
        target_ph = jnp.tile(
            jax.nn.softmax(jax.random.normal(s2, (12,)) * 2.0)[None],
            (args.k, 1))
        target_nd = jnp.tile(
            (jax.random.uniform(s3, (16,)) * 4.0 + 1.0)[None], (args.k, 1))
        out = group_losses(full_params, light_params, z_img, target_ph,
                           target_nd)
        total_f = out["pitch_hist_f"] * 40.0 + out["note_density_f"]
        total_l = out["pitch_hist_l"] * 40.0 + out["note_density_l"]
        agree += int(jnp.argmin(total_f) == jnp.argmin(total_l))
        for r in rules:
            rule_mse[r].append(float(out[f"{r}_mse"]))

    agreement = agree / args.agree_groups
    print(f"selection agreement (k={args.k}, {args.agree_groups} groups): "
          f"{agreement:.3f}")
    for r in rules:
        print(f"rule-vector MSE light-vs-full [{r}]: "
              f"{np.mean(rule_mse[r]):.5f}")

    out_path = args.out.format(ch=args.ch)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    flat = flatten_tree(jax.device_get(light_params))
    if args.save_dtype == "float16":
        flat = {k: v.astype(np.float16) for k, v in flat.items()}
    np.savez_compressed(out_path, agreement=np.float32(agreement), **flat)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
