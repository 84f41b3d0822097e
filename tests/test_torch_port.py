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


# ---------------------------------------------------------------------------
# Value parity: functional torch forwards (independent re-statements of the
# reference semantics — dit.py:538-634 block math, rotary-embedding-torch
# 0.3.2 interleaved convention, taming diffusionmodules/model.py conv VAE)
# computed straight from the synthetic state dicts, compared against the
# Flax models applied to converted params. Pins qkv packing, adaLN 6-chunk
# order, rotary pairs, unpatchify, and NCHW->NHWC conv/GN layouts.
# ---------------------------------------------------------------------------

import math

torch = pytest.importorskip("torch")
F = torch.nn.functional


def _t(a):
    return torch.tensor(np.asarray(a), dtype=torch.float64)


def _lin(sd, name, x):
    return x @ _t(sd[f"{name}.weight"]).T + _t(sd[f"{name}.bias"])


def _rotate_interleaved(x, rot_dim):
    """rotary-embedding-torch 0.3.2 rotate_queries_or_keys on (B,H,N,D)."""
    n = x.shape[-2]
    freqs = 1.0 / (
        10000 ** (torch.arange(0, rot_dim, 2, dtype=torch.float64) / rot_dim)
    )
    ang = torch.arange(n, dtype=torch.float64)[:, None] * freqs[None]
    ang = ang.repeat_interleave(2, dim=-1)  # (N, rot_dim)
    x_rot, x_pass = x[..., :rot_dim], x[..., rot_dim:]
    x1 = x_rot[..., 0::2]
    x2 = x_rot[..., 1::2]
    half = torch.stack([-x2, x1], dim=-1).reshape(x_rot.shape)
    return torch.cat([x_rot * ang.cos() + half * ang.sin(), x_pass], dim=-1)


def _torch_dit_rotary(sd, x, t, y, depth, heads, patch, pitch):
    b, c_in, h, w = x.shape
    n = h * w // patch
    xt = x.permute(0, 2, 3, 1).reshape(b, n, -1)
    xt = _lin(sd, "x_embedder.MLP.2", F.silu(_lin(sd, "x_embedder.MLP.0", xt)))
    half_f = 128
    freqs = torch.exp(
        -math.log(10000) * torch.arange(half_f, dtype=torch.float64) / half_f
    )
    args = t.double()[:, None] * freqs[None]
    emb = torch.cat([args.cos(), args.sin()], dim=-1)
    c = _lin(sd, "t_embedder.mlp.2", F.silu(_lin(sd, "t_embedder.mlp.0", emb)))
    c = c + _t(sd["y_embedder.embedding_table.weight"])[y]
    hidden = c.shape[-1]
    head_dim = hidden // heads
    rot_dim = int(head_dim * 0.5)
    for i in range(depth):
        mod = _lin(sd, f"blocks.{i}.adaLN_modulation.1", F.silu(c))
        sm, scm, gm, sp, scp, gp = mod.chunk(6, dim=1)
        xm = F.layer_norm(xt, (hidden,), eps=1e-6) * (1 + scm.unsqueeze(1)) \
            + sm.unsqueeze(1)
        qkv = _lin(sd, f"blocks.{i}.attn.qkv", xm)
        qkv = qkv.reshape(b, n, 3, heads, head_dim).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        q = _rotate_interleaved(q, rot_dim)
        k = _rotate_interleaved(k, rot_dim)
        attn = torch.softmax(q @ k.transpose(-2, -1) / math.sqrt(head_dim), -1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, hidden)
        xt = xt + gm.unsqueeze(1) * _lin(sd, f"blocks.{i}.attn.proj", out)
        xm2 = F.layer_norm(xt, (hidden,), eps=1e-6) * (1 + scp.unsqueeze(1)) \
            + sp.unsqueeze(1)
        h1 = F.gelu(_lin(sd, f"blocks.{i}.mlp.fc1", xm2), approximate="tanh")
        xt = xt + gp.unsqueeze(1) * _lin(sd, f"blocks.{i}.mlp.fc2", h1)
    sh, sc = _lin(sd, "final_layer.adaLN_modulation.1", F.silu(c)).chunk(2, 1)
    xn = F.layer_norm(xt, (hidden,), eps=1e-6) * (1 + sc.unsqueeze(1)) \
        + sh.unsqueeze(1)
    out = _lin(sd, "final_layer.linear", xn)
    out = out.reshape(b, -1, pitch, c_in)
    return out.permute(0, 3, 1, 2)


def test_dit_rotary_value_parity_vs_torch_semantics():
    depth, hidden, heads, patch = 2, 64, 2, 8
    sd = _fake_dit_sd(depth=depth, hidden=hidden, heads=heads, patch=patch)
    # realistic weight scale: unit-variance weights explode activations to
    # ~1e3 over 2 blocks and swamp fp32 parity with amplification noise
    sd = {k: (v * 0.05).astype(np.float32) for k, v in sd.items()}
    model = DiTRotary(
        input_size=(128, 16), patch_size=patch, in_channels=4,
        hidden_size=hidden, depth=depth, num_heads=heads, num_classes=3,
        learn_sigma=False,
    )
    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 4, 128, 16)).astype(np.float32)
    t = np.array([17.0, 903.0], dtype=np.float32)
    y = np.array([0, 2])

    want = _torch_dit_rotary(
        sd, torch.tensor(x, dtype=torch.float64), torch.tensor(t),
        torch.tensor(y), depth, heads, patch, pitch=16,
    ).numpy()

    params = jax.tree_util.tree_map(jnp.asarray, convert_dit_rotary(sd, depth))
    with jax.default_matmul_precision("highest"):
        got = model.apply(params, jnp.asarray(x), jnp.asarray(t),
                          jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def _gn(sd, name, x, eps=1e-6):
    c = x.shape[1]
    groups = 32 if c % 32 == 0 else math.gcd(c, 32)
    return F.group_norm(x, groups, _t(sd[f"{name}.weight"]),
                        _t(sd[f"{name}.bias"]), eps)


def _conv2d(sd, name, x, stride=1, padding=0):
    return F.conv2d(x, _t(sd[f"{name}.weight"]), _t(sd[f"{name}.bias"]),
                    stride=stride, padding=padding)


def _res(sd, prefix, x):
    h = _conv2d(sd, f"{prefix}.conv1", F.silu(_gn(sd, f"{prefix}.norm1", x)),
                padding=1)
    h = _conv2d(sd, f"{prefix}.conv2", F.silu(_gn(sd, f"{prefix}.norm2", h)),
                padding=1)
    if f"{prefix}.nin_shortcut.weight" in sd:
        x = _conv2d(sd, f"{prefix}.nin_shortcut", x)
    return x + h


def _attn(sd, prefix, x):
    b, c, h, w = x.shape
    hn = _gn(sd, f"{prefix}.norm", x)
    q = _conv2d(sd, f"{prefix}.q", hn).reshape(b, c, h * w).permute(0, 2, 1)
    k = _conv2d(sd, f"{prefix}.k", hn).reshape(b, c, h * w)
    v = _conv2d(sd, f"{prefix}.v", hn).reshape(b, c, h * w)
    w_ = torch.softmax(torch.bmm(q, k) * (c ** -0.5), dim=2)
    h_ = torch.bmm(v, w_.permute(0, 2, 1)).reshape(b, c, h, w)
    return x + _conv2d(sd, f"{prefix}.proj_out", h_)


def _torch_vae_encode(sd, x, ch_mult, nrb):
    h = _conv2d(sd, "encoder.conv_in", x, padding=1)
    for lvl in range(len(ch_mult)):
        for blk in range(nrb):
            h = _res(sd, f"encoder.down.{lvl}.block.{blk}", h)
        if lvl != len(ch_mult) - 1:
            h = _conv2d(sd, f"encoder.down.{lvl}.downsample.conv",
                        F.pad(h, (0, 1, 0, 1)), stride=2)
    h = _res(sd, "encoder.mid.block_1", h)
    h = _attn(sd, "encoder.mid.attn_1", h)
    h = _res(sd, "encoder.mid.block_2", h)
    h = _conv2d(sd, "encoder.conv_out",
                F.silu(_gn(sd, "encoder.norm_out", h)), padding=1)
    return _conv2d(sd, "quant_conv", h)


def _torch_vae_decode(sd, z, ch_mult, nrb):
    h = _conv2d(sd, "decoder.conv_in", _conv2d(sd, "post_quant_conv", z),
                padding=1)
    h = _res(sd, "decoder.mid.block_1", h)
    h = _attn(sd, "decoder.mid.attn_1", h)
    h = _res(sd, "decoder.mid.block_2", h)
    for lvl in reversed(range(len(ch_mult))):
        for blk in range(nrb + 1):
            h = _res(sd, f"decoder.up.{lvl}.block.{blk}", h)
        if lvl != 0:
            h = F.interpolate(h, scale_factor=2.0, mode="nearest")
            h = _conv2d(sd, f"decoder.up.{lvl}.upsample.conv", h, padding=1)
    return _conv2d(sd, "decoder.conv_out",
                   F.silu(_gn(sd, "decoder.norm_out", h)), padding=1)


def test_vae_value_parity_vs_torch_semantics():
    ch_mult, nrb = (1, 2, 2, 4), 1
    sd = _fake_vae_sd(ch=32, ch_mult=ch_mult, nrb=nrb)
    # break the all-ones/zeros norm params so GN affine layout is exercised
    rng = np.random.default_rng(11)
    for k in list(sd):
        if ".norm" in k and k.endswith(".weight"):
            sd[k] = (1.0 + 0.3 * rng.normal(size=sd[k].shape)).astype(
                np.float32)
        if ".norm" in k and k.endswith(".bias"):
            sd[k] = (0.2 * rng.normal(size=sd[k].shape)).astype(np.float32)

    vae = AutoencoderKL(ch=32, ch_mult=ch_mult, num_res_blocks=nrb)
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_vae(sd, ch_mult=ch_mult, num_res_blocks=nrb)
    )
    x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)

    want_m = _torch_vae_encode(sd, torch.tensor(x, dtype=torch.float64),
                               ch_mult, nrb).numpy()
    with jax.default_matmul_precision("highest"):
        got_m = vae.apply(params, jnp.asarray(x),
                          method=AutoencoderKL.encode_moments)
    np.testing.assert_allclose(np.asarray(got_m), want_m, rtol=2e-4, atol=2e-4)

    z = want_m[:, :4].astype(np.float32)
    want_d = _torch_vae_decode(sd, torch.tensor(z, dtype=torch.float64),
                               ch_mult, nrb).numpy()
    with jax.default_matmul_precision("highest"):
        got_d = vae.apply(params, jnp.asarray(z), method=AutoencoderKL.decode)
    np.testing.assert_allclose(np.asarray(got_d), want_d, rtol=2e-4, atol=2e-4)
