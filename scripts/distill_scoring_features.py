"""Distill a rule-feature head for SCG candidate ranking.

Third-generation scoring lever (docs/PERF.md): the SCG guided step decodes
k*B candidate latents through the VAE only so `FUNC_DICT` can rank them
(reference gaussian_diffusion.py:518-560,1347-1379).  This trains
``models.scoring_head.RuleFeatureHead`` to predict the three rule feature
vectors DIRECTLY from x̂0 latents — removing the candidate decode from the
guided step entirely (~500x fewer FLOPs than a full decode at ch=64).

Teacher = full decode -> FUNC_DICT at the deployment operating point
(head input = x0 / scale_factor, i.e. latents with std ~1/1.2465 — the
round-2 light-decoder lesson).  Training loss mirrors the SCG selection
weights (pitch_hist 40 : note_density 1 : chord 1), with cross-entropy on
chord-tag logits.  Metrics reported:

  * per-rule feature error (mse / tag accuracy) on held-out latents,
  * SCG selection agreement: fraction of (k)-candidate groups where the
    head's ranking and the full decode+FUNC_DICT ranking pick the same
    argmax under the selection weights.

Saves params as .npz (utils.fixtures layout) for
``pipeline.make_sample_fn(scoring_feature_model=...)`` +
``params["scoring_features"]``.  Like the other light-scoring paths this
is selection-only and must pass the docs/PERF.md round-3 gate
(tests/test_light_scoring_gate.py) on real weights before production use.
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

from rule_guided_music_tpu.diffusion.latent import make_decode_fn
from rule_guided_music_tpu.models import AutoencoderKL, RuleFeatureHead
from rule_guided_music_tpu.pipeline import _init_on_host, load_checkpoint_params
from rule_guided_music_tpu.rules.registry import FUNC_DICT
from rule_guided_music_tpu.utils.fixtures import flatten_tree

RULES = ("pitch_hist", "note_density", "chord_progression")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--vae_path", default="")
    parser.add_argument("--teacher_ch", type=int, default=128,
                        help="teacher VAE width (reduce for CPU smoke tests)")
    parser.add_argument("--ch", type=int, default=64)
    parser.add_argument("--depth", type=int, default=4)
    parser.add_argument("--steps", type=int, default=600)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--latent_t", type=int, default=128)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--latent_std", type=float, default=1.0 / 1.2465,
                        help="std of the head-input latent dist "
                             "(default 1/scale_factor = deployment point)")
    parser.add_argument("--agree_groups", type=int, default=32,
                        help="k-candidate groups for selection agreement")
    parser.add_argument("--k", type=int, default=16)
    parser.add_argument("--out", default="loggings/scoring_features/ch{ch}.npz")
    parser.add_argument("--bf16", type=lambda s: s.lower() != "false",
                        default=True)
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

    shape = (args.batch, 4, args.latent_t, 16)
    w = args.latent_t // 16
    head = RuleFeatureHead(ch=args.ch, depth=args.depth, dtype=dtype)
    head_params = _init_on_host(
        head.init, jax.random.PRNGKey(3), jnp.zeros((1,) + shape[1:]))
    n_head = sum(p.size for p in jax.tree_util.tree_leaves(head_params))
    print(f"feature head ch={args.ch} depth={args.depth}: "
          f"{n_head/1e6:.2f}M params")

    # teacher: latent image -> long roll -> FUNC_DICT features
    # (scale_factor=1: inputs are already at the operating point)
    decode = make_decode_fn(
        lambda c: full.apply(full_params, c, method=AutoencoderKL.decode))

    @jax.jit
    def teacher_features(z_img):
        roll = decode(z_img)
        return {name: FUNC_DICT[name](roll) for name in RULES}

    opt = optax.adam(optax.cosine_decay_schedule(args.lr, args.steps))
    opt_state = opt.init(head_params)

    def loss_fn(p, z, tgt):
        out = head.apply(p, z)
        ph = ((out["pitch_hist"] - tgt["pitch_hist"]) ** 2).mean()
        nd = ((out["note_density"] - tgt["note_density"]) ** 2).mean()
        ce = optax.softmax_cross_entropy_with_integer_labels(
            out["chord_logits"], tgt["chord_progression"]).mean()
        return 40.0 * ph + nd + ce, (ph, nd, ce)

    @jax.jit
    def step(p, s, z, tgt):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, z, tgt)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss, aux

    rng = jax.random.PRNGKey(args.seed)
    t0 = time.perf_counter()
    for i in range(args.steps):
        rng, sub = jax.random.split(rng)
        z = jax.random.normal(sub, shape) * args.latent_std
        tgt = teacher_features(z)
        head_params, opt_state, loss, aux = step(head_params, opt_state,
                                                 z, tgt)
        if i % 50 == 0:
            ph, nd, ce = (float(a) for a in aux)
            print(f"distill step {i}: loss {float(loss):.4f} "
                  f"(ph {ph:.5f} nd {nd:.4f} chord_ce {ce:.4f}) "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)

    # --- metrics ------------------------------------------------------------
    weights = {"pitch_hist": 40.0, "note_density": 1.0,
               "chord_progression": 1.0}

    @jax.jit
    def group_scores(hp, z_img, targets):
        t_feats = teacher_features(z_img)
        h_feats = head.apply(hp, z_img, method=RuleFeatureHead.features)
        errs = {
            "ph_mse": ((t_feats["pitch_hist"]
                        - h_feats["pitch_hist"]) ** 2).mean(),
            "nd_mse": ((t_feats["note_density"]
                        - h_feats["note_density"]) ** 2).mean(),
            "chord_acc": (t_feats["chord_progression"]
                          == h_feats["chord_progression"])
            .astype(jnp.float32).mean(),
        }
        def total(feats):
            s = 0.0
            for name in RULES:
                gen = feats[name]
                tgt = targets[name]
                if name == "chord_progression":
                    loss = (gen != tgt).astype(jnp.float32).mean(-1)
                else:
                    loss = ((gen - tgt) ** 2).mean(-1)
                s = s + weights[name] * loss
            return s
        return total(t_feats), total(h_feats), errs

    agree = 0
    errs_acc = {"ph_mse": [], "nd_mse": [], "chord_acc": []}
    for g in range(args.agree_groups):
        rng, s1, s2, s3, s4 = jax.random.split(rng, 5)
        z_img = jax.random.normal(s1, (args.k,) + shape[1:]) * args.latent_std
        targets = {
            "pitch_hist": jnp.tile(
                jax.nn.softmax(jax.random.normal(s2, (12,)) * 2.0)[None],
                (args.k, 1)),
            "note_density": jnp.tile(
                (jax.random.uniform(s3, (2 * w,)) * 4.0 + 1.0)[None],
                (args.k, 1)),
            "chord_progression": jnp.tile(
                jax.random.randint(s4, (w,), 0, 8)[None], (args.k, 1)),
        }
        tf, th, errs = group_scores(head_params, z_img, targets)
        agree += int(jnp.argmin(tf) == jnp.argmin(th))
        for k_, v in errs.items():
            errs_acc[k_].append(float(v))

    agreement = agree / args.agree_groups
    print(f"selection agreement (k={args.k}, {args.agree_groups} groups): "
          f"{agreement:.3f}")
    for k_, v in errs_acc.items():
        print(f"feature error [{k_}]: {np.mean(v):.5f}")

    out_path = args.out.format(ch=args.ch)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    flat = flatten_tree(jax.device_get(
        jax.tree_util.tree_map(lambda a: a.astype(np.float32), head_params)))
    np.savez_compressed(out_path, agreement=np.float32(agreement), **flat)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
