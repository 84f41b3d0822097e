"""Build the committed quality-regression fixture (tests/fixtures/).

Trains, on CPU, a tiny KL-VAE (ch=16, f8) and a tiny DiTRotary (depth 2,
hidden 64) on structured synthetic rolls (C-major arpeggio texture with a
controlled density), then saves both param trees as one .npz. The fixture
backs tests/test_quality_regression.py: SCG on a *learned* model must beat
no-guidance on rule loss (VERDICT r1 item 7 — round 1 only had an
oracle-model variant, tests/test_sampling.py).

Deterministic: fixed seeds, fixed data. Rerun to regenerate:
    JAX_PLATFORMS=cpu python scripts/make_quality_fixture.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_platforms", "cpu")

from rule_guided_music_tpu.diffusion import gaussian as gd
from rule_guided_music_tpu.diffusion.schedule import make_schedule
from rule_guided_music_tpu.models import AutoencoderKL, DiT_models
from rule_guided_music_tpu.models.vae import DiagonalGaussian
from rule_guided_music_tpu.training.train_loop import get_kl_input
from rule_guided_music_tpu.utils.fixtures import flatten_tree, make_rolls

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures",
)

def main():
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    rolls = make_rolls(32)

    # --- tiny VAE ----------------------------------------------------------
    vae = AutoencoderKL(ch=32, ch_mult=(1, 1, 2, 2), num_res_blocks=1)
    chunks = rolls.reshape(32, 3, 128, 8, 128).transpose(0, 3, 1, 2, 4)
    chunks = chunks.reshape(-1, 3, 128, 128)  # (256, 3, 128, 128)
    vae_params = vae.init(
        jax.random.PRNGKey(0), jnp.asarray(chunks[:1]),
        rng=jax.random.PRNGKey(1),
    )
    vae_opt = optax.adam(2e-3)
    vae_opt_state = vae_opt.init(vae_params)

    def vae_loss(p, x, rng):
        moments = vae.apply(p, x, method=AutoencoderKL.encode_moments)
        post = DiagonalGaussian(moments, axis=1)
        rec = vae.apply(p, post.sample(rng), method=AutoencoderKL.decode)
        # sparse rolls: unweighted L1 collapses to all-background — weight
        # note pixels (target > -0.9) 20x so the decoder must render notes
        w = jnp.where(x > -0.9, 20.0, 1.0)
        rec_l1 = (w * jnp.abs(rec - x)).sum() / w.sum()
        return rec_l1 + 1e-4 * post.kl().mean()

    @jax.jit
    def vae_step(p, s, x, rng):
        loss, grads = jax.value_and_grad(vae_loss)(p, x, rng)
        updates, s = vae_opt.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    rng = jax.random.PRNGKey(2)
    rng_np = np.random.default_rng(3)
    for step in range(350):
        idx = rng_np.integers(0, len(chunks), size=8)
        rng, sub = jax.random.split(rng)
        vae_params, vae_opt_state, loss = vae_step(
            vae_params, vae_opt_state, jnp.asarray(chunks[idx]), sub
        )
        if step % 50 == 0:
            print(f"vae step {step}: L1+KL {float(loss):.4f}")

    # latent scale: 1/std of encoded training latents (compute_std.py role)
    encode = jax.jit(lambda p, x: vae.apply(
        p, x, method=AutoencoderKL.encode_moments))
    z = np.asarray(encode(vae_params, jnp.asarray(chunks[:64])))[:, :4]
    scale = float(1.0 / z.std())
    print(f"scale_factor: {scale:.4f}")

    # --- tiny DiTRotary on latent excerpts ---------------------------------
    model = DiT_models["DiTRotary_XS_8"](
        input_size=(128, 16), in_channels=4, num_classes=0, learn_sigma=False,
    )
    tables = make_schedule("linear", 1000).tables()
    lat = jax.jit(lambda p, batch: get_kl_input(
        lambda c: vae.apply(p, c, method=AutoencoderKL.encode_moments),
        batch, scale_factor=scale, recombine=False,
    ))(vae_params, jnp.asarray(rolls))          # (32, 4, 128, 16)
    lat = np.asarray(lat)
    print("latents:", lat.shape, "std", lat.std())

    params = model.init(jax.random.PRNGKey(4), jnp.asarray(lat[:1]),
                        jnp.zeros((1,)))
    dit_opt = optax.adamw(2e-3)
    dit_opt_state = dit_opt.init(params)

    def dit_loss(p, x0, t, rng):
        noise = jax.random.normal(rng, x0.shape)
        x_t = gd.q_sample(tables, x0, t, noise)
        eps = model.apply(p, x_t, tables.model_t[t])
        return ((eps - noise) ** 2).mean()

    @jax.jit
    def dit_step(p, s, x0, t, rng):
        loss, grads = jax.value_and_grad(dit_loss)(p, x0, t, rng)
        updates, s = dit_opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    for step in range(800):
        idx = rng_np.integers(0, len(lat), size=16)
        t = jnp.asarray(rng_np.integers(0, 1000, size=16), dtype=jnp.int32)
        rng, sub = jax.random.split(rng)
        params, dit_opt_state, loss = dit_step(
            params, dit_opt_state, jnp.asarray(lat[idx]), t, sub
        )
        if step % 100 == 0:
            print(f"dit step {step}: eps-mse {float(loss):.4f}")

    out = os.path.join(FIXTURE_DIR, "quality_tiny.npz")
    np.savez_compressed(
        out,
        scale_factor=np.float32(scale),
        **{f"vae/{k}": v for k, v in flatten_tree(vae_params).items()},
        **{f"dit/{k}": v for k, v in flatten_tree(params).items()},
    )
    print(f"wrote {out} ({os.path.getsize(out)/1e6:.2f} MB)")


if __name__ == "__main__":
    main()
