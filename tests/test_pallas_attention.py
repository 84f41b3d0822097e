"""Pallas flash-attention kernel vs reference einsum attention.

Runs in Pallas interpret mode on CPU (the kernel path proper is exercised
on TPU by bench/verification runs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def reference_attention(q, k, v):
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k,
                        precision=jax.lax.Precision.HIGHEST)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", probs, v,
                      precision=jax.lax.Precision.HIGHEST)


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.mark.parametrize("shape", [
    (2, 256, 4, 64),    # aligned
    (1, 256, 2, 72),    # DiT head_dim 72 -> lane padding
    (1, 200, 2, 64),    # sequence padding + key masking
])
def test_flash_attention_matches_reference(shape):
    from rule_guided_music_tpu.ops.pallas_attention import flash_attention

    b, n, h, d = shape
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], shape, jnp.float32)
    k = jax.random.normal(ks[1], shape, jnp.float32)
    v = jax.random.normal(ks[2], shape, jnp.float32)
    out = flash_attention(q, k, v, block_q=128, block_k=128)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_flash_attention_multi_kv_blocks():
    from rule_guided_music_tpu.ops.pallas_attention import flash_attention

    shape = (1, 512, 2, 64)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(kk, shape, jnp.float32) for kk in ks)
    out = flash_attention(q, k, v, block_q=128, block_k=128)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)
