"""DiT model family: rotary/2-D denoisers and time-conditioned classifiers.

Flax re-architecture of guided_diffusion/dit.py:379-983. Same model zoo and
naming so reference configs resolve unchanged; forward contract is
``model.apply(vars, x, t, y)`` with x in NCHW ``(B, C, H, W)`` (latents:
``(B, 4, 128, 16)``) and output NCHW with 2C channels when ``learn_sigma``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rotary import make_rotary_table
from .layers import (
    Attention,
    ClassifierHead,
    DiTBlock,
    FinalLayer,
    FlattenNorm,
    FlattenPatchify1D,
    LabelEmbedder,
    PatchEmbed,
    TimestepEmbedder,
    get_1d_sincos_pos_embed,
    get_2d_sincos_pos_embed,
)

Dtype = jnp.dtype


def _as_hw(input_size) -> Tuple[int, int]:
    if isinstance(input_size, int):
        return (input_size, input_size)
    if len(input_size) == 1:
        return (input_size[0], input_size[0])
    return tuple(input_size)


class DiTRotary(nn.Module):
    """1-D-patchified DiT with rotary attention — the flagship denoiser
    (reference: dit.py:538-634; DiTRotary_XL_8 at :902)."""

    input_size: Sequence[int] = (128, 16)
    patch_size: int = 8
    in_channels: int = 4
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    class_dropout_prob: float = 0.1
    num_classes: int = 3
    learn_sigma: bool = False
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    # Gradient rematerialization: recompute each block's activations in the
    # backward pass instead of storing them (jax.checkpoint per block) —
    # trades ~1/3 more FLOPs for O(depth) less activation HBM, the standard
    # lever for training the XL trunk at large batch on one chip.
    remat: bool = False
    # Sequence parallelism: an optional sharding (NamedSharding or
    # PartitionSpec under an ambient mesh) for the (B, N, D) token
    # activations, e.g. NamedSharding(mesh, P('data', 'seq', None)).
    # GSPMD keeps norms/MLP token-sharded and inserts the all-gather /
    # reduce-scatter pair around attention automatically.
    token_spec: Optional[object] = None
    # int8 serving (ops/quant.py) for the four token-level matmuls per
    # block; embedders, adaLN, final layer stay fp.  "w8a8" = dynamic
    # per-token int8 activations on the s8 MXU path; "w8a16" = weight-only
    # (int8 storage/streaming, bf16 compute) — the measured win at serving
    # batches on v5e (docs/PERF.md).  Load params via quantize_dit_params.
    quant: Any = False  # False | "w8a8" | "w8a16"

    @property
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.learn_sigma else self.in_channels

    def _constrain(self, tokens):
        if self.token_spec is None:
            return tokens
        return jax.lax.with_sharding_constraint(tokens, self.token_spec)

    @nn.compact
    def __call__(self, x, t, y=None, train: bool = False):
        h, w = _as_hw(self.input_size)
        b = x.shape[0]
        seq_len = x.shape[2] * x.shape[3] // self.patch_size
        x = FlattenPatchify1D(
            self.in_channels, self.hidden_size, self.patch_size,
            dtype=self.dtype, name="x_embedder",
        )(x)
        c = TimestepEmbedder(self.hidden_size, dtype=self.dtype,
                             name="t_embedder")(t)
        if self.num_classes and y is not None:
            c = c + LabelEmbedder(
                self.num_classes, self.hidden_size, self.class_dropout_prob,
                dtype=self.dtype, name="y_embedder",
            )(y, train=train)

        head_dim = self.hidden_size // self.num_heads
        rotary = make_rotary_table(seq_len, int(head_dim * 0.5))
        block_cls = nn.remat(DiTBlock) if self.remat else DiTBlock
        x = self._constrain(x)
        for i in range(self.depth):
            x = block_cls(
                self.hidden_size, self.num_heads, self.mlp_ratio,
                dtype=self.dtype, attn_impl=self.attn_impl,
                quant=self.quant, name=f"blocks_{i}",
            )(x, c, rotary=rotary)
            x = self._constrain(x)
        x = FinalLayer(
            self.hidden_size, self.patch_size * self.out_channels,
            dtype=self.dtype, name="final_layer",
        )(x, c)
        # unpatchify: (B, N, patch*C) -> (B, C, H', W) (dit.py:608-616)
        x = x.reshape(b, -1, w, self.out_channels)
        return jnp.transpose(x, (0, 3, 1, 2)).astype(jnp.float32)


class DiT(nn.Module):
    """2-D DiT with fixed sin-cos positional embedding (dit.py:379-535)."""

    input_size: Sequence[int] = (32, 32)
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    class_dropout_prob: float = 0.1
    num_classes: int = 3
    learn_sigma: bool = False
    patchify: bool = True
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    quant: Any = False  # False | "w8a8" | "w8a16" (ops/quant.py)

    @property
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.learn_sigma else self.in_channels

    @nn.compact
    def __call__(self, x, t, y=None, train: bool = False):
        h, w = _as_hw(self.input_size)
        b = x.shape[0]
        if self.patchify:
            grid_h, grid_w = h // self.patch_size, w // self.patch_size
            tokens = PatchEmbed(self.patch_size, self.hidden_size,
                                dtype=self.dtype, name="x_embedder")(x)
            pos = get_2d_sincos_pos_embed(self.hidden_size, grid_h, grid_w)
        else:
            tokens = FlattenNorm(self.hidden_size, dtype=self.dtype,
                                 name="x_embedder")(x)
            pos = get_1d_sincos_pos_embed(
                self.hidden_size, np.arange(h, dtype=np.float32)
            )
        tokens = tokens + jnp.asarray(pos, dtype=tokens.dtype)[None]

        c = TimestepEmbedder(self.hidden_size, dtype=self.dtype,
                             name="t_embedder")(t)
        if self.num_classes and y is not None:
            c = c + LabelEmbedder(
                self.num_classes, self.hidden_size, self.class_dropout_prob,
                dtype=self.dtype, name="y_embedder",
            )(y, train=train)
        for i in range(self.depth):
            tokens = DiTBlock(
                self.hidden_size, self.num_heads, self.mlp_ratio,
                dtype=self.dtype, attn_impl=self.attn_impl,
                quant=self.quant, name=f"blocks_{i}",
            )(tokens, c)

        if self.patchify:
            out = FinalLayer(
                self.hidden_size,
                self.patch_size * self.patch_size * self.out_channels,
                dtype=self.dtype, name="final_layer",
            )(tokens, c)
            p = self.patch_size
            gh, gw = h // p, w // p
            out = out.reshape(b, gh, gw, p, p, self.out_channels)
            out = jnp.einsum("nhwpqc->nchpwq", out)
            out = out.reshape(b, self.out_channels, h, w)
        else:
            out = FinalLayer(
                self.hidden_size, self.patch_size * self.out_channels,
                dtype=self.dtype, name="final_layer",
            )(tokens, c)
            out = out.reshape(b, out.shape[1], self.out_channels, -1)
            out = jnp.transpose(out, (0, 2, 1, 3))
        return out.astype(jnp.float32)


class DiTClassifier(nn.Module):
    """Time-conditioned CLS-token classifier (dit.py:637-732)."""

    input_size: Sequence[int] = (128, 16)
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_classes: int = 9
    patchify: bool = True
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        h, w = _as_hw(self.input_size)
        b = x.shape[0]
        if self.patchify:
            tokens = PatchEmbed(self.patch_size, self.hidden_size,
                                dtype=self.dtype, name="x_embedder")(x)
            pos = get_2d_sincos_pos_embed(
                self.hidden_size, h // self.patch_size, w // self.patch_size
            )
        else:
            tokens = FlattenNorm(self.hidden_size, dtype=self.dtype,
                                 name="x_embedder")(x)
            pos = get_1d_sincos_pos_embed(
                self.hidden_size, np.arange(h, dtype=np.float32)
            )
        tokens = tokens + jnp.asarray(pos, dtype=tokens.dtype)[None]
        cls_token = self.param(
            "cls_token", nn.initializers.normal(stddev=1e-6),
            (1, 1, self.hidden_size),
        )
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (b, 1, self.hidden_size)).astype(tokens.dtype), tokens],
            axis=1,
        )
        c = TimestepEmbedder(self.hidden_size, dtype=self.dtype,
                             name="t_embedder")(t)
        for i in range(self.depth):
            tokens = DiTBlock(
                self.hidden_size, self.num_heads, self.mlp_ratio,
                dtype=self.dtype, attn_impl=self.attn_impl, name=f"blocks_{i}",
            )(tokens, c)
        return ClassifierHead(
            self.hidden_size, self.num_classes, dtype=self.dtype, name="head"
        )(tokens[:, 0, :]).astype(jnp.float32)


class DiTRotaryClassifier(nn.Module):
    """Rotary classifier; the chord variant adds a 25-way key head on the CLS
    token plus per-16-token chord predictions (dit.py:735-831)."""

    input_size: Sequence[int] = (128, 16)
    patch_size: int = 8
    in_channels: int = 4
    hidden_size: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    num_classes: int = 9
    chord: bool = False
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        b = x.shape[0]
        n_token = x.shape[2] // x.shape[3]  # windows for the chord head
        tokens = FlattenPatchify1D(
            self.in_channels, self.hidden_size, self.patch_size,
            dtype=self.dtype, name="x_embedder",
        )(x)
        cls_token = self.param(
            "cls_token", nn.initializers.normal(stddev=1e-6),
            (1, 1, self.hidden_size),
        )
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (b, 1, self.hidden_size)).astype(tokens.dtype), tokens],
            axis=1,
        )
        c = TimestepEmbedder(self.hidden_size, dtype=self.dtype,
                             name="t_embedder")(t)
        head_dim = self.hidden_size // self.num_heads
        rotary = make_rotary_table(tokens.shape[1], int(head_dim * 0.5))
        for i in range(self.depth):
            tokens = DiTBlock(
                self.hidden_size, self.num_heads, self.mlp_ratio,
                dtype=self.dtype, attn_impl=self.attn_impl, name=f"blocks_{i}",
            )(tokens, c, rotary=rotary)
        if self.chord:
            key_logits = ClassifierHead(
                self.hidden_size, 25, dtype=self.dtype, name="head_key"
            )(tokens[:, 0, :])
            chord_tokens = tokens[:, 1:, :].reshape(
                b, n_token, -1, self.hidden_size
            ).mean(axis=-2)
            chord_logits = ClassifierHead(
                self.hidden_size, self.num_classes, dtype=self.dtype, name="head"
            )(chord_tokens)
            return key_logits.astype(jnp.float32), chord_logits.astype(jnp.float32)
        return ClassifierHead(
            self.hidden_size, self.num_classes, dtype=self.dtype, name="head"
        )(tokens[:, 0, :]).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Model registry (dit.py:893-983) — same public names as the reference.
# ---------------------------------------------------------------------------

def _dit(depth, hidden, patch, heads):
    return lambda **kw: DiT(depth=depth, hidden_size=hidden, patch_size=patch,
                            num_heads=heads, **kw)


def _rot(depth, hidden, patch, heads):
    return lambda **kw: DiTRotary(depth=depth, hidden_size=hidden,
                                  patch_size=patch, num_heads=heads, **kw)


def _cls(depth, hidden, patch, heads):
    return lambda **kw: DiTClassifier(depth=depth, hidden_size=hidden,
                                      patch_size=patch, num_heads=heads, **kw)


def _rot_cls(depth, hidden, patch, heads, chord=False):
    return lambda **kw: DiTRotaryClassifier(
        depth=depth, hidden_size=hidden, patch_size=patch, num_heads=heads,
        chord=chord, **kw,
    )


DiT_models = {
    "DiT-XL/2": _dit(28, 1152, 2, 16), "DiT-XL/4": _dit(28, 1152, 4, 16),
    "DiT-XL/8": _dit(28, 1152, 8, 16),
    "DiT-L/2": _dit(24, 1024, 2, 16), "DiT-L/4": _dit(24, 1024, 4, 16),
    "DiT-L/8": _dit(24, 1024, 8, 16),
    "DiT-B/2": _dit(12, 768, 2, 12), "DiT-B/4": _dit(12, 768, 4, 12),
    "DiT-B/8": _dit(12, 768, 8, 12),
    "DiT-S/2": _dit(12, 384, 2, 6), "DiT-S/4": _dit(12, 384, 4, 6),
    "DiT-S/8": _dit(12, 384, 8, 6),
    "DiTRotary_B_16": _rot(12, 768, 16, 12), "DiTRotary_B_8": _rot(12, 768, 8, 12),
    "DiTRotary_XL_16": _rot(28, 1152, 16, 16), "DiTRotary_XL_8": _rot(28, 1152, 8, 16),
    # small configs for tests/smoke runs (not in the reference zoo)
    "DiTRotary_S_8": _rot(12, 384, 8, 6),
    "DiTRotary_XS_8": _rot(2, 64, 8, 2),
    "DiT-B/4-cls": _cls(12, 768, 4, 12), "DiT-B/8-cls": _cls(12, 768, 8, 12),
    "DiT-S/4-cls": _cls(12, 384, 4, 6), "DiT-S/2-cls": _cls(12, 384, 2, 6),
    "DiT-XS/2-cls": _cls(4, 384, 2, 6),
    "DiTRotary-XS/8-cls": _rot_cls(4, 384, 8, 6),
    "DiTRotary-S/8-cls": _rot_cls(12, 384, 8, 6),
    "DiTRotary-S/8-chord-cls": _rot_cls(12, 384, 8, 6, chord=True),
    "DiTRotary-B/8-cls": _rot_cls(12, 768, 8, 12),
}
