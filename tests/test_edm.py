"""EDM Heun sampler tests."""

import jax
import jax.numpy as jnp
import numpy as np

from rule_guided_music_tpu.diffusion.edm import (
    heun_sample_loop,
    karras_sigmas,
    vp_eps_fn_from_model,
)


def test_karras_sigmas_monotone():
    s = karras_sigmas(20, 1e-3, 80.0)
    assert s[0] == 80.0 and s[-1] == 0.0
    assert (np.diff(s) < 0).all()


def test_heun_oracle_recovers_x0():
    shape = (2, 1, 8, 8)
    x0 = jnp.full(shape, 0.4)

    # eps(x, sigma) for data concentrated at x0: eps = (x - x0)/sigma
    def eps_fn(x, sigma_b):
        sig = sigma_b.reshape((-1,) + (1,) * (x.ndim - 1))
        return (x - x0) / jnp.maximum(sig, 1e-8)

    out = heun_sample_loop(jax.random.PRNGKey(0), eps_fn, shape, num_steps=20)
    np.testing.assert_allclose(np.asarray(out), 0.4, atol=1e-2)


def test_heun_with_churn_still_converges():
    shape = (1, 1, 4, 4)
    x0 = jnp.full(shape, -0.2)

    def eps_fn(x, sigma_b):
        sig = sigma_b.reshape((-1,) + (1,) * (x.ndim - 1))
        return (x - x0) / jnp.maximum(sig, 1e-8)

    out = heun_sample_loop(
        jax.random.PRNGKey(1), eps_fn, shape, num_steps=30, s_churn=10.0
    )
    np.testing.assert_allclose(np.asarray(out), -0.2, atol=5e-2)


def test_vp_adapter_maps_sigmas_to_timesteps():
    from rule_guided_music_tpu.diffusion import gaussian as gd
    from rule_guided_music_tpu.diffusion.schedule import make_schedule

    tables = make_schedule("linear", 100).tables()
    x0 = jnp.full((1, 1, 4, 4), 0.25)

    def model_fn(x_t, model_t, y=None):
        t = model_t.astype(jnp.int32)
        return gd.predict_eps_from_xstart(tables, x_t, t, x0)

    eps_fn = vp_eps_fn_from_model(tables, model_fn)
    sigma_max = float(
        np.sqrt(1 - np.asarray(tables.alphas_cumprod)[-1])
        / np.sqrt(np.asarray(tables.alphas_cumprod)[-1])
    )
    out = heun_sample_loop(
        jax.random.PRNGKey(0), eps_fn, (1, 1, 4, 4), num_steps=30,
        sigma_max=sigma_max,
    )
    np.testing.assert_allclose(np.asarray(out), 0.25, atol=0.05)
