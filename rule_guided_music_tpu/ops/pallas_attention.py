"""Fused flash-attention Pallas kernel for TPU.

Optional drop-in behind ``sdpa(..., impl='pallas')`` (ops/attention.py).
The DiT workloads here run short sequences (256 tokens), where XLA's fused
attention is already near-optimal; this kernel matters for long-sequence
regimes (DiffCollage windows stacked into one sequence, future long-context
models) where materializing (N, N) fp32 logits becomes HBM-bound.

Design: one grid program per (batch*head, query-block); K/V stream through
VMEM in blocks with a running (max, sum, accumulator) online-softmax state;
padded key positions are masked inside the kernel with a broadcasted iota.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, scale: float,
                  valid_n: int):
    """One (batch*head, q-block) program: stream K/V, online softmax."""
    q = q_ref[0].astype(jnp.float32) * scale              # (bq, d)
    n_k = k_ref.shape[1]
    num_blocks = n_k // block_k
    bq, d = q.shape

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
        col = col + i * block_k
        logits = jnp.where(col < valid_n, logits, -jnp.inf)
        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + p.sum(axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    init = (
        jnp.full((bq, 1), -jnp.inf, jnp.float32),
        jnp.zeros((bq, 1), jnp.float32),
        jnp.zeros((bq, d), jnp.float32),
    )
    m, l, acc = jax.lax.fori_loop(0, num_blocks, body, init)
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    """Attention over (B, N, H, D); returns (B, N, H, D)."""
    b, n, h, d = q.shape
    scale = d ** -0.5
    block_q = min(block_q, max(8, n))
    block_k = min(block_k, max(128, n))
    n_pad = max(-(-n // block_q) * block_q, -(-n // block_k) * block_k)
    d_pad = -(-d // 128) * 128

    def prep(x):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, n, d)
        return _pad_to(_pad_to(x, n_pad, 1), d_pad, 2)

    qq, kk, vv = prep(q), prep(k), prep(v)
    grid = (b * h, n_pad // block_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, block_k=block_k, scale=scale, valid_n=n
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d_pad), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, n_pad, d_pad), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n_pad, d_pad), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0)),
    )(qq, kk, vv)

    out = out[:, :n, :d].reshape(b, h, n, d)
    return jnp.transpose(out, (0, 2, 1, 3))
