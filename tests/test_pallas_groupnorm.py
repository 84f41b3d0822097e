"""Fused GroupNorm+swish kernel vs flax reference (interpret mode)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(autouse=True)
def interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def reference_gn_swish(x, scale, bias, num_groups, eps=1e-6):
    gn = nn.GroupNorm(num_groups=num_groups, epsilon=eps)
    params = {"params": {"scale": scale, "bias": bias}}
    y = gn.apply(params, x)
    return y * jax.nn.sigmoid(y)


@pytest.mark.parametrize("shape,groups", [
    ((2, 16, 16, 64), 32),
    ((1, 8, 8, 128), 32),
    ((3, 4, 4, 8), 4),
])
def test_groupnorm_swish_matches_flax(shape, groups):
    from rule_guided_music_tpu.ops.pallas_groupnorm import groupnorm_swish

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(ks[0], shape, jnp.float32) * 2 + 0.5
    scale = jax.random.normal(ks[1], (shape[-1],)) * 0.1 + 1.0
    bias = jax.random.normal(ks[2], (shape[-1],)) * 0.1
    out = groupnorm_swish(x, scale, bias, num_groups=groups)
    ref = reference_gn_swish(x, scale, bias, groups)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_groupnorm_swish_bf16():
    from rule_guided_music_tpu.ops.pallas_groupnorm import groupnorm_swish

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 64), jnp.bfloat16)
    scale = jnp.ones((64,))
    bias = jnp.zeros((64,))
    out = groupnorm_swish(x, scale, bias, num_groups=32)
    ref = reference_gn_swish(x.astype(jnp.float32), scale, bias, 32)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_groupnorm_swish_level0_geometry():
    """Decoder level-0 analog (striped stats over large H)."""
    from rule_guided_music_tpu.ops.pallas_groupnorm import groupnorm_swish

    shape = (1, 64, 32, 128)
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    x = jax.random.normal(ks[0], shape, jnp.float32)
    scale = jax.random.normal(ks[1], (128,)) * 0.1 + 1.0
    bias = jax.random.normal(ks[2], (128,)) * 0.1
    out = groupnorm_swish(x, scale, bias, num_groups=32, stripe=8)
    ref = reference_gn_swish(x, scale, bias, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-4, rtol=3e-4)


def test_fused_groupnorm_swish_grad_matches_reference():
    """custom_vjp backward (used by DPS grads through the fused VAE decoder)
    matches autodiff of the plain formulation."""
    from rule_guided_music_tpu.ops.pallas_groupnorm import (
        _gn_swish_ref,
        fused_groupnorm_swish,
    )

    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    x = jax.random.normal(ks[0], (2, 4, 4, 16))
    scale = jax.random.normal(ks[1], (16,)) * 0.1 + 1.0
    bias = jax.random.normal(ks[2], (16,)) * 0.1

    def loss_fused(x, s, b):
        return (fused_groupnorm_swish(x, s, b, 4) ** 2).sum()

    def loss_ref(x, s, b):
        return (_gn_swish_ref(x, s, b, 4, 1e-6) ** 2).sum()

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_groupnorm_swish_odd_height_stripe_fallback():
    from rule_guided_music_tpu.ops.pallas_groupnorm import groupnorm_swish

    shape = (2, 12, 8, 32)  # H=12: stripe 8 -> falls back to 6
    x = jax.random.normal(jax.random.PRNGKey(3), shape, jnp.float32)
    scale = jnp.ones((32,))
    bias = jnp.zeros((32,))
    out = groupnorm_swish(x, scale, bias, num_groups=8, stripe=8)
    ref = reference_gn_swish(x, scale, bias, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-4, rtol=3e-4)
