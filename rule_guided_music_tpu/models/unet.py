"""ADM UNet family (pixel-space path) in Flax.

Re-architecture of guided_diffusion/unet.py:407-906: the legacy/pixel-space
denoiser (UNetModel), the super-resolution variant, and the EncoderUNetModel
classifier with pooling and optional chord head. Kept for the reference's
pixel-space configs (fs=12.5, 128x128 rolls, no VAE); the latent DiT path is
the flagship.

TPU adaptations: NHWC convs internally (NCHW API), bf16 compute / fp32
params, scale-shift GroupNorm conditioning, attention in (B, N, H, D).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import sdpa
from .layers import timestep_embedding

Dtype = jnp.dtype


def _gn(c: int) -> int:
    return 32 if c % 32 == 0 else math.gcd(c, 32)


class ResBlock(nn.Module):
    """ADM ResBlock with scale-shift norm conditioning (unet.py:143-247)."""

    out_channels: int
    use_scale_shift_norm: bool = True
    up: bool = False
    down: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=_gn(in_ch), epsilon=1e-5,
                         dtype=self.dtype, name="in_norm")(x)
        h = nn.silu(h)

        def resample(v):
            b, hh, ww, c = v.shape
            if self.up:
                return jax.image.resize(v, (b, hh * 2, ww * 2, c), "nearest")
            if self.down:
                return nn.avg_pool(v, (2, 2), strides=(2, 2))
            return v

        if self.up or self.down:
            h = resample(h)
            x = resample(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="in_conv")(h)

        emb_out = nn.Dense(
            2 * self.out_channels if self.use_scale_shift_norm
            else self.out_channels,
            dtype=self.dtype, name="emb_proj",
        )(nn.silu(emb))

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out[:, None, None, :], 2, axis=-1)
            h = nn.GroupNorm(num_groups=_gn(self.out_channels), epsilon=1e-5,
                             dtype=self.dtype, name="out_norm")(h)
            h = h * (1 + scale) + shift
            h = nn.silu(h)
        else:
            h = h + emb_out[:, None, None, :]
            h = nn.GroupNorm(num_groups=_gn(self.out_channels), epsilon=1e-5,
                             dtype=self.dtype, name="out_norm")(h)
            h = nn.silu(h)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, name="out_conv",
        )(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="skip")(x)
        return x + h


class AttentionBlock(nn.Module):
    """Spatial self-attention at a feature map (unet.py:259-305)."""

    num_heads: int = 4
    num_head_channels: int = -1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        heads = (self.num_heads if self.num_head_channels == -1
                 else max(c // self.num_head_channels, 1))
        n = hh * ww
        h = nn.GroupNorm(num_groups=_gn(c), epsilon=1e-5, dtype=self.dtype,
                         name="norm")(x).reshape(b, n, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(h)
        qkv = qkv.reshape(b, n, 3, heads, c // heads)
        out = sdpa(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
        out = nn.Dense(c, kernel_init=nn.initializers.zeros,
                       dtype=self.dtype, name="proj")(out.reshape(b, n, c))
        return x + out.reshape(b, hh, ww, c)


class UNetModel(nn.Module):
    """ADM UNet denoiser (unet.py:407-677). NCHW API like the DiTs."""

    in_channels: int = 3
    model_channels: int = 128
    out_channels: int = 3
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 8, 16)  # downsample factors
    channel_mult: Tuple[int, ...] = (1, 1, 2, 3, 4)
    num_classes: Optional[int] = None
    num_heads: int = 4
    num_head_channels: int = -1
    use_scale_shift_norm: bool = True
    resblock_updown: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, y=None, train: bool = False):
        x = jnp.transpose(x, (0, 2, 3, 1))
        emb = nn.Dense(self.model_channels * 4, dtype=self.dtype,
                       name="time_embed_0")(
            timestep_embedding(t, self.model_channels)
        )
        emb = nn.Dense(self.model_channels * 4, dtype=self.dtype,
                       name="time_embed_2")(nn.silu(emb))
        if self.num_classes is not None and y is not None:
            label_emb = nn.Embed(self.num_classes, self.model_channels * 4,
                                 dtype=self.dtype, name="label_emb")(y)
            emb = emb + label_emb

        ch = self.model_channels
        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        hs = [h]
        ds = 1
        # down path
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                h = ResBlock(self.model_channels * mult,
                             self.use_scale_shift_norm, dtype=self.dtype,
                             name=f"down_{level}_res_{i}")(h, emb)
                if ds in self.attention_resolutions:
                    h = AttentionBlock(self.num_heads, self.num_head_channels,
                                       dtype=self.dtype,
                                       name=f"down_{level}_attn_{i}")(h)
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = ResBlock(h.shape[-1], self.use_scale_shift_norm,
                                 down=True, dtype=self.dtype,
                                 name=f"down_{level}_downsample")(h, emb)
                else:
                    h = nn.Conv(h.shape[-1], (3, 3), strides=(2, 2), padding=1,
                                dtype=self.dtype,
                                name=f"down_{level}_downsample")(h)
                hs.append(h)
                ds *= 2
        # middle
        h = ResBlock(h.shape[-1], self.use_scale_shift_norm, dtype=self.dtype,
                     name="mid_res_1")(h, emb)
        h = AttentionBlock(self.num_heads, self.num_head_channels,
                           dtype=self.dtype, name="mid_attn")(h)
        h = ResBlock(h.shape[-1], self.use_scale_shift_norm, dtype=self.dtype,
                     name="mid_res_2")(h, emb)
        # up path
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = ResBlock(self.model_channels * mult,
                             self.use_scale_shift_norm, dtype=self.dtype,
                             name=f"up_{level}_res_{i}")(h, emb)
                if ds in self.attention_resolutions:
                    h = AttentionBlock(self.num_heads, self.num_head_channels,
                                       dtype=self.dtype,
                                       name=f"up_{level}_attn_{i}")(h)
            if level != 0:
                if self.resblock_updown:
                    h = ResBlock(h.shape[-1], self.use_scale_shift_norm,
                                 up=True, dtype=self.dtype,
                                 name=f"up_{level}_upsample")(h, emb)
                else:
                    b, hh, ww, c = h.shape
                    h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
                    h = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                                name=f"up_{level}_upsample")(h)
                ds //= 2
        h = nn.GroupNorm(num_groups=_gn(h.shape[-1]), epsilon=1e-5,
                         dtype=self.dtype, name="out_norm")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1,
                    kernel_init=nn.initializers.zeros, dtype=self.dtype,
                    name="out_conv")(h)
        return jnp.transpose(h, (0, 3, 1, 2)).astype(jnp.float32)


class SuperResModel(nn.Module):
    """UNet conditioned on a (bilinearly upsampled) low-res roll
    (unet.py:677-694): concatenates the upsampled conditioning as channels."""

    unet: UNetModel

    @nn.compact
    def __call__(self, x, t, low_res, y=None):
        b, c, h, w = x.shape
        low = jnp.transpose(low_res, (0, 2, 3, 1))
        low = jax.image.resize(low, (b, h, w, low.shape[-1]), "bilinear")
        low = jnp.transpose(low, (0, 3, 1, 2))
        return self.unet(jnp.concatenate([x, low], axis=1), t, y)


class EncoderUNetModel(nn.Module):
    """Half-UNet classifier with pooling + optional chord head
    (unet.py:694-906, chord head :33-59,850)."""

    in_channels: int = 3
    model_channels: int = 128
    out_channels: int = 16
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 8, 16)
    channel_mult: Tuple[int, ...] = (1, 1, 2, 3, 4)
    num_heads: int = 4
    num_head_channels: int = 64
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    pool: str = "attention"
    chord: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        x = jnp.transpose(x, (0, 2, 3, 1))
        emb = nn.Dense(self.model_channels * 4, dtype=self.dtype,
                       name="time_embed_0")(
            timestep_embedding(t, self.model_channels)
        )
        emb = nn.Dense(self.model_channels * 4, dtype=self.dtype,
                       name="time_embed_2")(nn.silu(emb))

        h = nn.Conv(self.model_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x)
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                h = ResBlock(self.model_channels * mult,
                             self.use_scale_shift_norm, dtype=self.dtype,
                             name=f"down_{level}_res_{i}")(h, emb)
                if ds in self.attention_resolutions:
                    h = AttentionBlock(self.num_heads, self.num_head_channels,
                                       dtype=self.dtype,
                                       name=f"down_{level}_attn_{i}")(h)
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = ResBlock(h.shape[-1], self.use_scale_shift_norm,
                                 down=True, dtype=self.dtype,
                                 name=f"down_{level}_downsample")(h, emb)
                else:
                    h = nn.Conv(h.shape[-1], (3, 3), strides=(2, 2), padding=1,
                                dtype=self.dtype,
                                name=f"down_{level}_downsample")(h)
                ds *= 2
        h = ResBlock(h.shape[-1], self.use_scale_shift_norm, dtype=self.dtype,
                     name="mid_res_1")(h, emb)
        h = AttentionBlock(self.num_heads, self.num_head_channels,
                           dtype=self.dtype, name="mid_attn")(h)
        h = ResBlock(h.shape[-1], self.use_scale_shift_norm, dtype=self.dtype,
                     name="mid_res_2")(h, emb)
        h = nn.GroupNorm(num_groups=_gn(h.shape[-1]), epsilon=1e-5,
                         dtype=self.dtype, name="out_norm")(h)
        h = nn.silu(h)

        if self.chord:
            # pool per time-window (width axis) for per-window chord logits
            b, hh, ww, c = h.shape
            pooled_t = h.mean(axis=1)                # (B, W, C)
            chord_logits = nn.Dense(self.out_channels, dtype=self.dtype,
                                    name="chord_head")(pooled_t)
            pooled = h.mean(axis=(1, 2))
            key_logits = nn.Dense(25, dtype=self.dtype, name="key_head")(pooled)
            return (key_logits.astype(jnp.float32),
                    chord_logits.astype(jnp.float32))

        if self.pool == "attention":
            # attention pooling: mean-query attention over spatial positions
            b, hh, ww, c = h.shape
            flat = h.reshape(b, hh * ww, c)
            q = flat.mean(axis=1, keepdims=True)
            attn = jax.nn.softmax(
                jnp.einsum("bqc,bnc->bqn", q, flat) / jnp.sqrt(c), axis=-1
            )
            pooled = jnp.einsum("bqn,bnc->bqc", attn, flat)[:, 0]
        else:
            pooled = h.mean(axis=(1, 2))
        out = nn.Dense(self.out_channels, dtype=self.dtype, name="head")(pooled)
        return out.astype(jnp.float32)
