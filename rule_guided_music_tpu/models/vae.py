"""KL-VAE (f8) encoder/decoder in Flax.

Re-architecture of the taming-transformers conv VAE used by the reference
(taming/modules/diffusionmodules/model.py:342-540, taming/models/
klvae_pedal.py): ch=128, ch_mult (1,2,2,4), 2 res-blocks, mid attention,
double_z, embed_dim 4 — mapping (3, 128, 128) piano-roll chunks to
(4, 16, 16) latents.

TPU-first choices: convs run NHWC (XLA's native TPU conv layout); the public
``encode_moments`` / ``decode`` API stays NCHW for parity with the reference
call sites. GroupNorm(32, eps 1e-6) + swish nonlinearity throughout.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = jnp.dtype


def nonlinearity(x):
    return x * jax.nn.sigmoid(x)  # swish


def _num_groups(channels: int) -> int:
    """GroupNorm(32) in the reference; adapt when test configs are narrower."""
    return 32 if channels % 32 == 0 else math.gcd(channels, 32)


class FusedNormSwish(nn.Module):
    """GroupNorm + swish with an optional fused Pallas kernel path.

    Declares "scale"/"bias" directly (same tree position and shapes as
    nn.GroupNorm), so fused and unfused variants — and torch-converted
    checkpoints — share identical parameter trees.
    """

    fused: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        groups = _num_groups(c)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if not self.fused:
            # Exactly flax's GroupNorm computation (params passed through;
            # no submodule scope is created) — this keeps the unfused HLO
            # identical to the plain `nn.GroupNorm` formulation, which XLA
            # compiles measurably better than a hand-rolled fp32
            # reshape-based variant (see docs/PERF.md).
            gn = nn.GroupNorm(num_groups=groups, epsilon=1e-6,
                              dtype=self.dtype)
            y = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
            return nonlinearity(y)

        # Pallas kernel on TPU lowering, pure-XLA elsewhere (CPU init/
        # tests); differentiable via a custom VJP over the XLA formulation.
        from ..ops.pallas_groupnorm import fused_groupnorm_swish

        return fused_groupnorm_swish(x, scale, bias, groups)


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32
    fused_gn: bool = False

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        h = FusedNormSwish(fused=self.fused_gn, dtype=self.dtype,
                           name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = FusedNormSwish(fused=self.fused_gn, dtype=self.dtype,
                           name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hn = nn.GroupNorm(num_groups=_num_groups(c), epsilon=1e-6, dtype=self.dtype,
                          name="norm")(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(hn).reshape(b, h * w, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(hn).reshape(b, h * w, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(hn).reshape(b, h * w, c)
        attn = jnp.einsum("bqc,bkc->bqk", q, k) * (c ** -0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class Downsample(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # Asymmetric (0, 1) pad + stride-2 valid conv, matching the torch fork.
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(x.shape[-1], (3, 3), strides=(2, 2), padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 2, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    double_z: bool = True
    dtype: Dtype = jnp.float32
    fused_gn: bool = False

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x)
        for i_level, mult in enumerate(self.ch_mult):
            for i_block in range(self.num_res_blocks):
                h = ResnetBlock(self.ch * mult, dtype=self.dtype,
                                fused_gn=self.fused_gn,
                                name=f"down_{i_level}_block_{i_block}")(h)
            if i_level != len(self.ch_mult) - 1:
                h = Downsample(dtype=self.dtype,
                               name=f"down_{i_level}_downsample")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype,
                        fused_gn=self.fused_gn, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype,
                        fused_gn=self.fused_gn, name="mid_block_2")(h)
        h = FusedNormSwish(fused=self.fused_gn, dtype=self.dtype,
                           name="norm_out")(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


class Decoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 2, 4)
    num_res_blocks: int = 2
    out_ch: int = 3
    dtype: Dtype = jnp.float32
    fused_gn: bool = False

    @nn.compact
    def __call__(self, z):
        block_in = self.ch * self.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(z)
        h = ResnetBlock(block_in, dtype=self.dtype,
                        fused_gn=self.fused_gn, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(block_in, dtype=self.dtype,
                        fused_gn=self.fused_gn, name="mid_block_2")(h)
        for i_level in reversed(range(len(self.ch_mult))):
            for i_block in range(self.num_res_blocks + 1):
                h = ResnetBlock(self.ch * self.ch_mult[i_level], dtype=self.dtype,
                                fused_gn=self.fused_gn,
                                name=f"up_{i_level}_block_{i_block}")(h)
            if i_level != 0:
                h = Upsample(dtype=self.dtype, name=f"up_{i_level}_upsample")(h)
        h = FusedNormSwish(fused=self.fused_gn, dtype=self.dtype,
                           name="norm_out")(h)
        return nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


class DiagonalGaussian:
    """Diagonal Gaussian over latents, from concatenated (mean ‖ logvar).

    Channel-axis convention matches the caller (axis=1 for NCHW moments).
    Reference: taming/modules/distributions/distributions.py:24-62.
    """

    def __init__(self, moments: jnp.ndarray, axis: int = 1):
        mean, logvar = jnp.split(moments, 2, axis=axis)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)

    def sample(self, rng):
        return self.mean + self.std * jax.random.normal(rng, self.mean.shape)

    def mode(self):
        return self.mean

    def kl(self):
        return 0.5 * jnp.sum(
            self.mean**2 + self.var - 1.0 - self.logvar,
            axis=tuple(range(1, self.mean.ndim)),
        )

    def nll(self, sample):
        logtwopi = jnp.log(2.0 * jnp.pi)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + (sample - self.mean) ** 2 / self.var,
            axis=tuple(range(1, self.mean.ndim)),
        )


class ScoringDecoder(nn.Module):
    """Reduced-width decoder for SCG candidate *scoring* (opt-in perf lever).

    SCG spends ~75% of a guided step decoding k*B candidate latents through
    the full decoder only to rank them by rule loss (docs/PERF.md). This is
    a narrower decoder (default ch=64: ~4x fewer conv FLOPs) distilled to
    match the full decoder's outputs (scripts/distill_scoring_decoder.py) —
    selection semantics only; the final decode stays full, mirroring the
    reference where selection and output decode are the same call but only
    selection is throughput-critical (gaussian_diffusion.py:524,1347-1358).

    Same NCHW ``decode`` API as AutoencoderKL so it can stand in for the
    scoring path in pipeline.make_sample_fn(scoring_vae_model=...).
    """

    ch: int = 64
    ch_mult: Sequence[int] = (1, 2, 2, 4)
    num_res_blocks: int = 2
    out_ch: int = 3
    z_channels: int = 4
    dtype: Dtype = jnp.float32

    def setup(self):
        self.post_quant_conv = nn.Conv(self.z_channels, (1, 1),
                                       dtype=self.dtype)
        self.decoder = Decoder(
            ch=self.ch, ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks, out_ch=self.out_ch,
            dtype=self.dtype,
        )

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        z = jnp.transpose(z, (0, 2, 3, 1))
        z = self.post_quant_conv(z)
        dec = self.decoder(z)
        return jnp.transpose(dec, (0, 3, 1, 2)).astype(jnp.float32)

    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decode(z)


class AutoencoderKL(nn.Module):
    """KL autoencoder with quant convs (taming/models/klvae_pedal.py:13-102).

    Public API is NCHW:
      - ``encode_moments(x)``: (B, 3, H, W) -> (B, 8, H/8, W/8) raw moments
        (the reference's ``encode_save``).
      - ``decode(z)``: (B, 4, H/8, W/8) -> (B, 3, H, W).
      - ``__call__``: full reconstruction pass (for VAE training).
    """

    embed_dim: int = 4
    z_channels: int = 4
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 2, 4)
    num_res_blocks: int = 2
    out_ch: int = 3
    dtype: Dtype = jnp.float32
    fused_gn: bool = False   # fused Pallas GroupNorm+swish (TPU)

    def setup(self):
        self.encoder = Encoder(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            z_channels=self.z_channels, double_z=True, dtype=self.dtype,
            fused_gn=self.fused_gn,
        )
        self.decoder = Decoder(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            out_ch=self.out_ch, dtype=self.dtype, fused_gn=self.fused_gn,
        )
        self.quant_conv = nn.Conv(2 * self.embed_dim, (1, 1), dtype=self.dtype,
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(self.z_channels, (1, 1), dtype=self.dtype,
                                       name="post_quant_conv")

    def encode_moments(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.transpose(x, (0, 2, 3, 1))
        h = self.encoder(x)
        moments = self.quant_conv(h)
        return jnp.transpose(moments, (0, 3, 1, 2)).astype(jnp.float32)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        z = jnp.transpose(z, (0, 2, 3, 1))
        z = self.post_quant_conv(z)
        dec = self.decoder(z)
        return jnp.transpose(dec, (0, 3, 1, 2)).astype(jnp.float32)

    def __call__(self, x: jnp.ndarray, rng=None, sample_posterior: bool = True):
        moments = self.encode_moments(x)
        posterior = DiagonalGaussian(moments, axis=1)
        z = posterior.sample(rng) if sample_posterior else posterior.mode()
        return self.decode(z), posterior
