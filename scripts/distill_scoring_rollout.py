"""Distill a reduced-size rollout denoiser for SCG candidate ranking.

The guided SCG step spends (k)/(k+1) of its denoiser FLOPs on the one-step
candidate rollout (gaussian_diffusion.py:518-524) whose x̂0 estimate exists
ONLY to rank candidates — it never enters the trajectory.  Like the light
scoring decoder (scripts/distill_scoring_decoder.py), a cheaper model can
stand in for ranking while the chain itself keeps the full model: train a
smaller DiTRotary (default DiTRotary_B_8, ~5.3x fewer FLOPs than XL) to
match the teacher's x̂0 predictions on the sampler's operating
distribution, then measure what matters:

  * SCG selection agreement — fraction of (B, k)-candidate groups where
    ranking with the student picks the teacher's argmax candidate, scoring
    through the same (full) decoder;
  * x̂0 prediction MSE across the guided-step timestep range.

Saves the student params as an .npz (utils.fixtures layout) for
pipeline.make_sample_fn(scoring_denoiser_model=...) +
params["scoring_denoiser"].  Use --model_path to distill against real
teacher weights; without it the teacher is random-init (still a valid
perf/agreement protocol — the bench uses the same weights).
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

from rule_guided_music_tpu.diffusion import gaussian as gd
from rule_guided_music_tpu.diffusion.latent import make_decode_fn
from rule_guided_music_tpu.diffusion.schedule import make_schedule
from rule_guided_music_tpu.models import AutoencoderKL, DiT_models
from rule_guided_music_tpu.pipeline import _init_on_host, load_checkpoint_params
from rule_guided_music_tpu.rules.registry import FUNC_DICT
from rule_guided_music_tpu.utils.fixtures import flatten_tree


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--teacher", default="DiTRotary_XL_8")
    parser.add_argument("--student", default="DiTRotary_B_8")
    parser.add_argument("--model_path", default="",
                        help="teacher weights (converted bundle)")
    parser.add_argument("--vae_path", default="",
                        help="VAE weights for the agreement gate's decode")
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--t_max", type=int, default=750,
                        help="distill over the guided-step range t < t_max")
    parser.add_argument("--agree_groups", type=int, default=32)
    parser.add_argument("--k", type=int, default=16)
    parser.add_argument("--num_classes", type=int, default=3)
    parser.add_argument("--vae_ch", type=int, default=128,
                        help="agreement-gate VAE width (reduce for smoke)")
    parser.add_argument("--out",
                        default="loggings/scoring_rollout/{student}.npz")
    parser.add_argument("--bf16", type=lambda s: s.lower() != "false",
                        default=True)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    mk = dict(input_size=(128, 16), in_channels=4,
              num_classes=args.num_classes, learn_sigma=False, dtype=dtype)
    teacher = DiT_models[args.teacher](**mk)
    student = DiT_models[args.student](**mk)

    x0 = jnp.zeros((1, 4, 128, 16))
    t0 = jnp.zeros((1,))
    y0 = jnp.zeros((1,), dtype=jnp.int32)
    t_params = _init_on_host(teacher.init, jax.random.PRNGKey(1), x0, t0, y0)
    if args.model_path:
        t_params = load_checkpoint_params(args.model_path, target=t_params)
        print(f"teacher: {args.model_path}")
    else:
        # adaLN-Zero models output exactly 0 at init — perturb so the
        # random teacher is a non-degenerate target for the protocol
        rngp = np.random.default_rng(args.seed)
        t_params = jax.tree_util.tree_map(
            lambda a: a + jnp.asarray(
                0.02 * rngp.standard_normal(a.shape), dtype=a.dtype),
            t_params,
        )
        print("teacher: random-init, perturbed (no --model_path)")
    s_params = _init_on_host(student.init, jax.random.PRNGKey(2), x0, t0, y0)

    n_t = sum(p.size for p in jax.tree_util.tree_leaves(t_params))
    n_s = sum(p.size for p in jax.tree_util.tree_leaves(s_params))
    print(f"student {args.student}: {n_s/1e6:.0f}M params "
          f"(teacher {args.teacher}: {n_t/1e6:.0f}M)")

    tables = make_schedule("linear", 1000).tables()
    teacher_fwd = jax.jit(lambda p, x, t, y: teacher.apply(p, x, t, y))

    def sample_batch(rng):
        """(x_t, t, y) from the sampler's operating distribution: unit
        gaussian latents noised to a uniform guided-range t."""
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        x = jax.random.normal(r1, (args.batch, 4, 128, 16))
        t = jax.random.randint(r2, (args.batch,), 0, args.t_max)
        x_t = gd.q_sample(tables, x, t, jax.random.normal(r3, x.shape))
        y = jax.random.randint(r4, (args.batch,), 0, max(args.num_classes, 1))
        return x_t, t, y

    def x0_from(model_apply, p, x_t, t, y):
        eps = model_apply(p, x_t, tables.model_t[t], y)
        return gd.predict_xstart_from_eps(tables, x_t, t, eps)

    opt = optax.adam(args.lr)
    opt_state = opt.init(s_params)

    def loss_fn(p, x_t, t, y, target_x0):
        pred = x0_from(lambda pp, x, tt, yy: student.apply(pp, x, tt, yy),
                       p, x_t, t, y)
        return ((pred - target_x0) ** 2).mean()

    @jax.jit
    def step(p, s, x_t, t, y, target_x0):
        loss, grads = jax.value_and_grad(loss_fn)(p, x_t, t, y, target_x0)
        updates, s = opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    rng = jax.random.PRNGKey(args.seed)
    t_start = time.perf_counter()
    for i in range(args.steps):
        rng, sub = jax.random.split(rng)
        x_t, t, y = sample_batch(sub)
        target = x0_from(teacher_fwd, t_params, x_t, t, y)
        s_params, opt_state, loss = step(s_params, opt_state, x_t, t, y,
                                         target)
        if i % 100 == 0:
            print(f"distill step {i}: x0-MSE {float(loss):.5f} "
                  f"({time.perf_counter()-t_start:.0f}s)", flush=True)

    # --- agreement gate ------------------------------------------------------
    vae = AutoencoderKL(ch=args.vae_ch, dtype=dtype)
    vae_params = _init_on_host(
        vae.init, jax.random.PRNGKey(3), jnp.zeros((1, 3, 128, 128)),
        rng=jax.random.PRNGKey(4),
    )
    if args.vae_path:
        vae_params = load_checkpoint_params(args.vae_path, target=vae_params)

    @jax.jit
    def group_rank(tp, sp, vp, rng, target_ph):
        # params are explicit args: never close jit over weight arrays
        # (remote-compile constant limit, see pipeline.py docstring)
        r1, r2, r3 = jax.random.split(rng, 3)
        t_scalar = jax.random.randint(r1, (), 0, args.t_max)
        t = jnp.full((args.k,), t_scalar, dtype=jnp.int32)
        x = jax.random.normal(r2, (args.k, 4, 128, 16))
        x_t = gd.q_sample(tables, x, t, jax.random.normal(r3, x.shape))
        y = jnp.zeros((args.k,), dtype=jnp.int32)
        dec = make_decode_fn(
            lambda c: vae.apply(vp, c, method=AutoencoderKL.decode))
        losses = {}
        for name, apply, p in [
            ("t", lambda pp, xx, tt, yy: teacher.apply(pp, xx, tt, yy), tp),
            ("s", lambda pp, xx, tt, yy: student.apply(pp, xx, tt, yy), sp),
        ]:
            x0 = x0_from(apply, p, x_t, t, y)
            roll = dec(x0)
            ph = FUNC_DICT["pitch_hist"](roll)
            losses[name] = ((ph - target_ph) ** 2).mean(axis=-1)
        spread = losses["t"].max() - losses["t"].min()
        return jnp.argmin(losses["t"]), jnp.argmin(losses["s"]), \
            ((losses["t"] - losses["s"]) ** 2).mean(), spread

    agree, n_valid, mses = 0, 0, []
    for g in range(args.agree_groups):
        rng, r1, r2 = jax.random.split(rng, 3)
        target_ph = jnp.tile(
            jax.nn.softmax(jax.random.normal(r2, (12,)) * 2.0)[None],
            (args.k, 1))
        a, b, mse, spread = group_rank(t_params, s_params, vae_params, r1,
                                       target_ph)
        if float(spread) < 1e-9:
            # all candidates score identically (e.g. a random VAE decodes
            # below the roll threshold): agreement would be vacuous
            continue
        n_valid += 1
        agree += int(a == b)
        mses.append(float(mse))
    if n_valid == 0:
        print("WARNING: every candidate group tied — the decode path is "
              "degenerate (random weights?); agreement not measurable")
        agreement = 0.0
    else:
        agreement = agree / n_valid
        print(f"selection agreement (k={args.k}, {n_valid}/"
              f"{args.agree_groups} non-tied groups): {agreement:.3f} "
              f"(chance {1/args.k:.3f}); rank-loss MSE {np.mean(mses):.6f}")

    out_path = args.out.format(student=args.student.replace("/", "_"))
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    flat = flatten_tree(jax.device_get(s_params))
    np.savez_compressed(out_path, agreement=np.float32(agreement), **flat)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
