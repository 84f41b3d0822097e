"""Rotary position embeddings (partial-dim, interleaved-pair convention).

Matches the convention of the `rotary-embedding-torch` package used by the
reference (guided_diffusion/dit.py:269-272, 571-572): for head dim D the
rotary dim is R = D // 2 ("50% rotary"); frequencies are
``1 / 10000**(2i/R)`` for i in [0, R/2); rotation acts on interleaved pairs
(0,1), (2,3), ... of the first R dims; the remaining D - R dims pass through.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class RotaryTable(NamedTuple):
    cos: jnp.ndarray  # (N, R)
    sin: jnp.ndarray  # (N, R)
    rot_dim: int


def make_rotary_table(seq_len: int, rot_dim: int, theta: float = 10000.0) -> RotaryTable:
    """Precompute cos/sin tables for positions [0, seq_len)."""
    assert rot_dim % 2 == 0
    freqs = 1.0 / (theta ** (np.arange(0, rot_dim, 2, dtype=np.float64) / rot_dim))
    angles = np.arange(seq_len, dtype=np.float64)[:, None] * freqs[None, :]  # (N, R/2)
    angles = np.repeat(angles, 2, axis=-1)  # interleave-duplicate -> (N, R)
    return RotaryTable(
        cos=jnp.asarray(np.cos(angles), dtype=jnp.float32),
        sin=jnp.asarray(np.sin(angles), dtype=jnp.float32),
        rot_dim=rot_dim,
    )


def _rotate_half_interleaved(x: jnp.ndarray) -> jnp.ndarray:
    """(x0, x1, x2, x3, ...) -> (-x1, x0, -x3, x2, ...)."""
    x_pairs = x.reshape(x.shape[:-1] + (-1, 2))
    x1 = x_pairs[..., 0]
    x2 = x_pairs[..., 1]
    rotated = jnp.stack([-x2, x1], axis=-1)
    return rotated.reshape(x.shape)


def apply_rotary(x: jnp.ndarray, table: RotaryTable) -> jnp.ndarray:
    """Apply rotary embedding to x shaped (..., N, D) with D >= rot_dim."""
    # derive from the (always-static) table shape, NOT table.rot_dim: under
    # lifted transforms (nn.remat) scalar pytree leaves become tracers and
    # cannot drive slicing
    rot_dim = table.cos.shape[-1]
    n = x.shape[-2]
    cos = table.cos[:n].astype(x.dtype)
    sin = table.sin[:n].astype(x.dtype)
    x_rot, x_pass = x[..., :rot_dim], x[..., rot_dim:]
    x_rot = x_rot * cos + _rotate_half_interleaved(x_rot) * sin
    return jnp.concatenate([x_rot, x_pass], axis=-1)
