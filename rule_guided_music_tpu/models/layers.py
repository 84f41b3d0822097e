"""Flax building blocks for the DiT model family.

Re-architected from guided_diffusion/dit.py (embedders :33-227, blocks
:234-376) for TPU: bf16 compute / fp32 params, attention in (B, N, H, D)
layout, rotary tables precomputed host-side, adaLN-Zero init parity.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import sdpa
from ..ops.quant import QuantDense
from ..ops.rotary import RotaryTable, apply_rotary

Dtype = jnp.dtype


def _dense(quant, features: int, *, name: str, dtype,
           use_bias: bool = True, kernel_init=None):
    """Token-level dense: fp (XLA bf16 MXU) or int8 (ops/quant.py).

    `quant` is '' / False for fp, else a mode ('w8a8' dynamic-activation
    int8, 'w8a16' weight-only) — see normalize_quant_mode.
    """
    if quant:
        mode = "w8a8" if quant is True else str(quant)
        return QuantDense(features, use_bias=use_bias, dtype=dtype,
                          mode=mode, name=name)
    return nn.Dense(features, use_bias=use_bias,
                    kernel_init=kernel_init or xavier, dtype=dtype, name=name)

xavier = nn.initializers.xavier_uniform()
zeros = nn.initializers.zeros
normal02 = nn.initializers.normal(stddev=0.02)


def modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """adaLN modulation: x * (1 + scale) + shift, broadcasting over tokens."""
    return x * (1 + scale[:, None, :]) + shift[:, None, :]


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: int = 10000) -> jnp.ndarray:
    """Sinusoidal timestep embeddings, cos-first (dit.py:46-65)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class TimestepEmbedder(nn.Module):
    hidden_size: int
    frequency_embedding_size: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        x = timestep_embedding(t, self.frequency_embedding_size)
        x = nn.Dense(self.hidden_size, kernel_init=normal02, dtype=self.dtype,
                     name="mlp0")(x)
        x = nn.silu(x)
        x = nn.Dense(self.hidden_size, kernel_init=normal02, dtype=self.dtype,
                     name="mlp2")(x)
        return x


class LabelEmbedder(nn.Module):
    """Class-label embedding with CFG dropout (dit.py:73-100).

    When ``dropout_prob > 0`` the table has one extra row (the null label).
    """

    num_classes: int
    hidden_size: int
    dropout_prob: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, labels: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        use_cfg = self.dropout_prob > 0
        table = self.param(
            "embedding_table",
            normal02,
            (self.num_classes + int(use_cfg), self.hidden_size),
        )
        if train and use_cfg:
            rng = self.make_rng("label_dropout")
            drop = jax.random.uniform(rng, labels.shape) < self.dropout_prob
            labels = jnp.where(drop, self.num_classes, labels)
        return table[labels].astype(self.dtype)


class FlattenPatchify1D(nn.Module):
    """1-D patchify: (B, C, H, W) -> (B, H*W/patch, hidden) tokens.

    Each token covers `patch` consecutive (pitch, channel) cells within one
    time step (dit.py:200-227). For the flagship latent (4, 128, 16) with
    patch 8 this yields 256 tokens of 32 input features.
    """

    in_channels: int
    hidden_size: int
    patch_size: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, c, h, w = x.shape
        x = jnp.transpose(x, (0, 2, 3, 1))             # (B, H, W, C)
        num_patches = h * w // self.patch_size
        x = x.reshape(b, num_patches, self.patch_size * c)
        x = nn.Dense(256, kernel_init=xavier, dtype=self.dtype, name="mlp0")(x)
        x = nn.silu(x)
        x = nn.Dense(self.hidden_size, kernel_init=xavier, dtype=self.dtype,
                     name="mlp2")(x)
        return x


class FlattenNorm(nn.Module):
    """Whole-time-step flatten: (B, C, H, W) -> (B, H, hidden) (dit.py:177-197)."""

    hidden_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, c, h, w = x.shape
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b, h, c * w)
        x = nn.Dense(256, kernel_init=xavier, dtype=self.dtype, name="mlp0")(x)
        x = nn.silu(x)
        x = nn.Dense(self.hidden_size, kernel_init=xavier, dtype=self.dtype,
                     name="mlp2")(x)
        return x


class PatchEmbed(nn.Module):
    """2-D conv patchify (dit.py:107-174), NCHW in, (B, N, hidden) out."""

    patch_size: int
    hidden_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.transpose(x, (0, 2, 3, 1))             # NHWC for conv
        x = nn.Conv(
            self.hidden_size,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            kernel_init=xavier,
            dtype=self.dtype,
            name="proj",
        )(x)
        b, gh, gw, d = x.shape
        return x.reshape(b, gh * gw, d)


class Attention(nn.Module):
    """Multi-head self-attention, optionally rotary (dit.py:234-288)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    quant: Any = False  # False | "w8a8" | "w8a16" (ops/quant.py)

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, rotary: Optional[RotaryTable] = None
    ) -> jnp.ndarray:
        b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        qkv = _dense(
            self.quant, self.dim * 3, use_bias=self.qkv_bias,
            dtype=self.dtype, name="qkv",
        )(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, D)
        if rotary is not None:
            # rotary tables act on the sequence axis: (B, H, N, D) view
            q = jnp.swapaxes(apply_rotary(jnp.swapaxes(q, 1, 2), rotary), 1, 2)
            k = jnp.swapaxes(apply_rotary(jnp.swapaxes(k, 1, 2), rotary), 1, 2)
        out = sdpa(q, k, v, impl=self.attn_impl)
        out = out.reshape(b, n, c)
        return _dense(self.quant, self.dim, dtype=self.dtype,
                      name="proj")(out)


class Mlp(nn.Module):
    hidden_size: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32
    quant: Any = False  # False | "w8a8" | "w8a16" (ops/quant.py)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = int(self.hidden_size * self.mlp_ratio)
        x = _dense(self.quant, hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=True)
        x = _dense(self.quant, self.hidden_size, dtype=self.dtype,
                   name="fc2")(x)
        return x


class DiTBlock(nn.Module):
    """adaLN-Zero transformer block (dit.py:291-336).

    The 6-way modulation projection is zero-initialized so each block starts
    as identity — critical for DiT training stability.
    """

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    # int8 W8A8 serving path (ops/quant.py) for the four token-level
    # matmuls; the adaLN modulation below stays fp — it is FLOP-free
    # ((B, hidden) input) and zero-init-delicate.
    quant: Any = False  # False | "w8a8" | "w8a16" (ops/quant.py)

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, c: jnp.ndarray, rotary: Optional[RotaryTable] = None
    ) -> jnp.ndarray:
        mod = nn.Dense(
            6 * self.hidden_size, kernel_init=zeros, bias_init=zeros,
            dtype=self.dtype, name="adaLN_modulation",
        )(nn.silu(c))
        (shift_msa, scale_msa, gate_msa,
         shift_mlp, scale_mlp, gate_mlp) = jnp.split(mod, 6, axis=-1)
        norm1 = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                             dtype=self.dtype, name="norm1")(x)
        attn_out = Attention(
            self.hidden_size, self.num_heads, dtype=self.dtype,
            attn_impl=self.attn_impl, quant=self.quant, name="attn",
        )(modulate(norm1, shift_msa, scale_msa), rotary=rotary)
        x = x + gate_msa[:, None, :] * attn_out
        norm2 = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                             dtype=self.dtype, name="norm2")(x)
        mlp_out = Mlp(self.hidden_size, self.mlp_ratio, dtype=self.dtype,
                      quant=self.quant, name="mlp")(
                          modulate(norm2, shift_mlp, scale_mlp))
        x = x + gate_mlp[:, None, :] * mlp_out
        return x


class FinalLayer(nn.Module):
    """Zero-initialized adaLN output head (dit.py:339-376)."""

    hidden_size: int
    out_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        mod = nn.Dense(
            2 * self.hidden_size, kernel_init=zeros, bias_init=zeros,
            dtype=self.dtype, name="adaLN_modulation",
        )(nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         dtype=self.dtype, name="norm_final")(x)
        x = modulate(x, shift, scale)
        return nn.Dense(self.out_features, kernel_init=zeros, bias_init=zeros,
                        dtype=self.dtype, name="linear")(x)


class ClassifierHead(nn.Module):
    """LayerNorm + bottleneck MLP head (dit.py:674-676)."""

    hidden_size: int
    num_classes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.hidden_size // 4, kernel_init=xavier,
                     dtype=self.dtype, name="fc1")(x)
        x = nn.silu(x)
        return nn.Dense(self.num_classes, kernel_init=xavier,
                        dtype=self.dtype, name="fc2")(x)


# ---------------------------------------------------------------------------
# Fixed sin-cos positional embeddings (dit.py:839-886)
# ---------------------------------------------------------------------------


def get_1d_sincos_pos_embed(embed_dim: int, positions: np.ndarray) -> np.ndarray:
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", positions.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed(embed_dim: int, grid_h: int, grid_w: int) -> np.ndarray:
    gh = np.arange(grid_h, dtype=np.float32)
    gw = np.arange(grid_w, dtype=np.float32)
    grid = np.stack(np.meshgrid(gw, gh), axis=0)  # w first, matching reference
    grid = grid.reshape([2, 1, grid_h, grid_w])
    emb_h = get_1d_sincos_pos_embed(embed_dim // 2, grid[0])
    emb_w = get_1d_sincos_pos_embed(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)
