"""Torch->Flax converter tests: synthetic torch state dicts with reference
module names/shapes must convert into trees matching our flax templates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rule_guided_music_tpu.models import AutoencoderKL, DiTRotary, DiTRotaryClassifier
from rule_guided_music_tpu.models.torch_port import (
    assert_tree_shapes_match,
    convert_dit_rotary,
    convert_dit_rotary_classifier,
    convert_vae,
)


def _fake_dit_sd(depth=2, hidden=64, heads=2, patch=8, in_ch=4, num_classes=3):
    rng = np.random.default_rng(0)
    sd = {}

    def lin(name, i, o):
        sd[f"{name}.weight"] = rng.normal(size=(o, i)).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(size=(o,)).astype(np.float32)

    lin("x_embedder.MLP.0", in_ch * patch, 256)
    lin("x_embedder.MLP.2", 256, hidden)
    lin("t_embedder.mlp.0", 256, hidden)
    lin("t_embedder.mlp.2", hidden, hidden)
    sd["y_embedder.embedding_table.weight"] = rng.normal(
        size=(num_classes + 1, hidden)
    ).astype(np.float32)
    for i in range(depth):
        lin(f"blocks.{i}.adaLN_modulation.1", hidden, 6 * hidden)
        lin(f"blocks.{i}.attn.qkv", hidden, 3 * hidden)
        lin(f"blocks.{i}.attn.proj", hidden, hidden)
        lin(f"blocks.{i}.mlp.fc1", hidden, 4 * hidden)
        lin(f"blocks.{i}.mlp.fc2", 4 * hidden, hidden)
    lin("final_layer.adaLN_modulation.1", hidden, 2 * hidden)
    lin("final_layer.linear", hidden, patch * in_ch)
    return sd


def test_convert_dit_rotary_shapes_and_forward():
    model = DiTRotary(
        input_size=(128, 16), patch_size=8, in_channels=4, hidden_size=64,
        depth=2, num_heads=2, num_classes=3, learn_sigma=False,
    )
    x = jnp.zeros((2, 4, 128, 16))
    t = jnp.zeros((2,))
    y = jnp.zeros((2,), dtype=jnp.int32)
    template = model.init(jax.random.PRNGKey(0), x, t, y)

    sd = _fake_dit_sd()
    converted = convert_dit_rotary(sd, depth=2)
    assert_tree_shapes_match(converted, template)
    out = model.apply(
        jax.tree_util.tree_map(jnp.asarray, converted), x, t, y
    )
    assert out.shape == (2, 4, 128, 16)
    assert bool(jnp.isfinite(out).all())


def test_convert_qkv_packing_semantics():
    """Row-block [q;k;v] in torch == column-block [q;k;v] in flax: feeding a
    one-hot input isolates matching slices."""
    hidden = 8
    sd = _fake_dit_sd(depth=1, hidden=hidden, heads=2)
    w_torch = sd["blocks.0.attn.qkv.weight"]       # (3h, h)
    kernel = convert_dit_rotary(sd, depth=1)["params"]["blocks_0"]["attn"][
        "qkv"]["kernel"]                            # (h, 3h)
    x = np.zeros(hidden); x[3] = 1.0
    np.testing.assert_allclose(x @ kernel, w_torch @ x, rtol=1e-6)


def test_convert_classifier_with_chord_heads():
    model = DiTRotaryClassifier(
        input_size=(128, 16), patch_size=8, in_channels=4, hidden_size=64,
        depth=2, num_heads=2, num_classes=8, chord=True,
    )
    x = jnp.zeros((1, 4, 128, 16))
    t = jnp.zeros((1,))
    template = model.init(jax.random.PRNGKey(0), x, t)

    rng = np.random.default_rng(1)
    sd = _fake_dit_sd(depth=2, hidden=64)
    for k in list(sd):
        if k.startswith(("y_embedder", "final_layer")):
            del sd[k]
    sd["cls_token"] = rng.normal(size=(1, 1, 64)).astype(np.float32)
    for name, i, o in [
        ("classifier_head.0", 64, 16), ("classifier_head.2", 16, 8),
        ("classifier_head_key.0", 64, 16), ("classifier_head_key.2", 16, 25),
    ]:
        sd[f"{name}.weight"] = rng.normal(size=(o, i)).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(size=(o,)).astype(np.float32)
    for name in ["norm", "norm_key"]:
        sd[f"{name}.weight"] = np.ones(64, np.float32)
        sd[f"{name}.bias"] = np.zeros(64, np.float32)

    converted = convert_dit_rotary_classifier(sd, depth=2, chord=True)
    assert_tree_shapes_match(converted, template)
    key_logits, chord_logits = model.apply(
        jax.tree_util.tree_map(jnp.asarray, converted), x, t
    )
    assert key_logits.shape == (1, 25)
    assert chord_logits.shape == (1, 8, 8)


def _fake_vae_sd(ch=32, ch_mult=(1, 2, 2, 4), nrb=1, z=4, embed=4):
    rng = np.random.default_rng(2)
    sd = {}

    def conv(name, i, o, k=3):
        sd[f"{name}.weight"] = rng.normal(size=(o, i, k, k)).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = np.zeros(o, np.float32)

    def norm(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)

    def res(prefix, cin, cout):
        norm(f"{prefix}.norm1", cin)
        conv(f"{prefix}.conv1", cin, cout)
        norm(f"{prefix}.norm2", cout)
        conv(f"{prefix}.conv2", cout, cout)
        if cin != cout:
            conv(f"{prefix}.nin_shortcut", cin, cout, k=1)

    def attn(prefix, c):
        norm(f"{prefix}.norm", c)
        for nm in ["q", "k", "v", "proj_out"]:
            conv(f"{prefix}.{nm}", c, c, k=1)

    conv("encoder.conv_in", 3, ch)
    cin = ch
    for lvl, mult in enumerate(ch_mult):
        for b in range(nrb):
            res(f"encoder.down.{lvl}.block.{b}", cin, ch * mult)
            cin = ch * mult
        if lvl != len(ch_mult) - 1:
            conv(f"encoder.down.{lvl}.downsample.conv", cin, cin)
    res("encoder.mid.block_1", cin, cin)
    attn("encoder.mid.attn_1", cin)
    res("encoder.mid.block_2", cin, cin)
    norm("encoder.norm_out", cin)
    conv("encoder.conv_out", cin, 2 * z)

    top = ch * ch_mult[-1]
    conv("decoder.conv_in", z, top)
    res("decoder.mid.block_1", top, top)
    attn("decoder.mid.attn_1", top)
    res("decoder.mid.block_2", top, top)
    cin = top
    for lvl in reversed(range(len(ch_mult))):
        for b in range(nrb + 1):
            res(f"decoder.up.{lvl}.block.{b}", cin, ch * ch_mult[lvl])
            cin = ch * ch_mult[lvl]
        if lvl != 0:
            conv(f"decoder.up.{lvl}.upsample.conv", cin, cin)
    norm("decoder.norm_out", cin)
    conv("decoder.conv_out", cin, 3)
    conv("quant_conv", 2 * z, 2 * embed, k=1)
    conv("post_quant_conv", embed, z, k=1)
    return sd


def test_convert_vae_shapes_and_roundtrip():
    vae = AutoencoderKL(ch=32, ch_mult=(1, 2, 2, 4), num_res_blocks=1)
    template = vae.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 64)),
        rng=jax.random.PRNGKey(1),
    )
    sd = _fake_vae_sd()
    converted = convert_vae(sd, ch_mult=(1, 2, 2, 4), num_res_blocks=1)
    assert_tree_shapes_match(converted, template)
    params = jax.tree_util.tree_map(jnp.asarray, converted)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 64, 64))
    moments = vae.apply(params, x, method=AutoencoderKL.encode_moments)
    assert moments.shape == (1, 8, 8, 8)
    rec = vae.apply(params, moments[:, :4], method=AutoencoderKL.decode)
    assert rec.shape == (1, 3, 64, 64)
    assert bool(jnp.isfinite(rec).all())
