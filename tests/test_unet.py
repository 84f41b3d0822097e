"""UNet family shape tests (pixel-space path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rule_guided_music_tpu.models.unet import (
    EncoderUNetModel,
    SuperResModel,
    UNetModel,
)


def tiny_unet(**kw):
    return UNetModel(
        in_channels=3, model_channels=8, out_channels=3, num_res_blocks=1,
        attention_resolutions=(4,), channel_mult=(1, 2, 2), num_heads=2, **kw
    )


def test_unet_shapes():
    model = tiny_unet(num_classes=3)
    x = jnp.zeros((2, 3, 32, 32))
    t = jnp.zeros((2,))
    y = jnp.zeros((2,), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, y)
    out = model.apply(params, x, t, y)
    assert out.shape == (2, 3, 32, 32)
    assert bool(jnp.isfinite(out).all())


def test_unet_learn_sigma():
    model = UNetModel(
        in_channels=1, model_channels=8, out_channels=2, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1, 2), num_heads=2,
    )
    x = jnp.zeros((1, 1, 16, 16))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)))
    out = model.apply(params, x, jnp.zeros((1,)))
    assert out.shape == (1, 2, 16, 16)


def test_unet_zero_out_conv_at_init():
    """ADM zero-inits the output conv: output must be 0 at init."""
    model = tiny_unet()
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 32, 32))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)))
    out = model.apply(params, x, jnp.zeros((1,)))
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_encoder_unet_classifier():
    model = EncoderUNetModel(
        in_channels=3, model_channels=8, out_channels=16, num_res_blocks=1,
        attention_resolutions=(4,), channel_mult=(1, 2, 2), num_heads=2,
        pool="attention",
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 32, 32))
    params = model.init(jax.random.PRNGKey(1), x, jnp.zeros((2,)))
    out = model.apply(params, x, jnp.zeros((2,)))
    assert out.shape == (2, 16)


def test_encoder_unet_chord_heads():
    model = EncoderUNetModel(
        in_channels=3, model_channels=8, out_channels=8, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1, 2), num_heads=2,
        chord=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 32, 32))
    params = model.init(jax.random.PRNGKey(1), x, jnp.zeros((2,)))
    key_logits, chord_logits = model.apply(params, x, jnp.zeros((2,)))
    assert key_logits.shape == (2, 25)
    assert chord_logits.shape[0] == 2 and chord_logits.shape[-1] == 8


def test_super_res_model():
    model = SuperResModel(unet=UNetModel(
        in_channels=6, model_channels=8, out_channels=3, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1, 2), num_heads=2,
    ))
    x = jnp.zeros((1, 3, 32, 32))
    low = jnp.zeros((1, 3, 8, 8))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)), low)
    out = model.apply(params, x, jnp.zeros((1,)), low)
    assert out.shape == (1, 3, 32, 32)
